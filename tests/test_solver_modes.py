"""Solver mode tests: omni kinematics, truncate mode, adaptive horizon.

Pin the remaining sampler semantics from the reference:
``trajectory_sampler.cpp:157-168`` truncation, ``:222-275`` omni grid,
``dwa.cpp:157-206`` curvature-adaptive horizon.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kompass_core_tpu.control import DWA, DWAConfig, TrajectoryCostsWeights
from kompass_core_tpu.datatypes import LaserScanData
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)
from kompass_core_tpu.ops.solver import (
    SolverParams,
    SolverSpec,
    dwa_solve,
)
from kompass_core_tpu.ops.window import sample_velocity_window


def _limits():
    return RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        vy_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=2.0, max_acc=3.0, max_decel=3.0
        ),
    )


def test_omni_dwa_uses_lateral_motion():
    """An omni robot with a laterally-offset path must produce vy samples
    and reach the goal."""
    robot = Robot(
        robot_type=RobotType.OMNI,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.5]),
    )
    config = DWAConfig(
        max_linear_samples=8,
        max_angular_samples=5,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=2.0,
            goal_distance_weight=1.0,
            smoothness_weight=0.0,
            jerk_weight=0.0,
            obstacles_distance_weight=0.0,
        ),
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=0.1,
    )
    dwa = DWA(robot=robot, ctrl_limits=_limits(), config=config)
    # path straight ahead in +x
    dwa.set_path(np.array([[0.0, 0.0], [3.0, 0.0]]))
    dwa.set_current_state(0.0, 0.0, 0.0)
    res = dwa.compute_velocity_commands((0.3, 0.2, 0.0), laser_scan=LaserScanData())
    assert res.is_found
    # omni grid: the solver must have evaluated nonzero-vy samples; the
    # robot is on the path so the winner may have vy ~ 0, but the spec must
    # carry a vy axis
    spec, _, _ = dwa._solver_for(256)
    assert spec.is_omni and spec.n_vy >= 3


def _truncate_scenario(drop: bool, moving: bool = False):
    """One straight-ahead sample family with an obstacle at 1.0 m.

    ``moving=True`` runs the moving-obstacle sweep with the obstacle
    drifting across the lane at 0.3 m/s (backends must agree on it)."""
    spec = SolverSpec(
        is_omni=False,
        n_vx=3,
        n_vy=1,
        n_omega=3,
        max_points=20,
        num_ctrl_points=2,
        scan_size=32,
        seg_size=64,
        drop_samples=drop,
        moving_obstacles=moving,
    )
    limits = _limits().to_array()
    limits[3:6] = 0.0
    window = sample_velocity_window(
        (0.9, 0.0, 0.0), limits, 0.1, 3, 1, 3, False
    )
    obs = np.full((32, 2), 1e8, np.float32)
    obs[0] = [1.0, 0.0]  # obstacle straight ahead at 1 m
    n_seg = 40
    seg_x = np.full(64, 1e8, np.float32)
    seg_y = np.full(64, 1e8, np.float32)
    seg_arc = np.zeros(64, np.float32)
    seg_x[:n_seg] = np.linspace(0, 3.9, n_seg)
    seg_y[:n_seg] = 0.0
    seg_arc[:n_seg] = np.linspace(0, 3.9, n_seg)
    params = SolverParams.create(
        time_step=0.1,
        robot_radius=0.2,
        collision_margin=0.05,
        weights={
            "reference_path_distance_weight": 1.0,
            "goal_distance_weight": 1.0,
            "obstacles_distance_weight": 0.0,
            "smoothness_weight": 0.0,
            "jerk_weight": 0.0,
        },
        acc_limits=(5.0, 0.0, 3.0),
        max_obstacles_dist=10 / 3,
    )
    extra = {}
    if moving:
        vel = np.zeros((32, 2), np.float32)
        vel[0] = [0.0, 0.3]  # the 1 m obstacle drifts across the lane
        extra["obs_vel"] = jnp.asarray(vel)
    return dwa_solve(
        spec,
        params,
        jnp.array([0.0, 0.0, 0.0], jnp.float32),
        window,
        jnp.asarray(obs),
        jnp.int32(1),
        jnp.asarray(seg_x),
        jnp.asarray(seg_y),
        jnp.asarray(seg_arc),
        jnp.int32(n_seg),
        jnp.float32(3.9),
        jnp.float32(3.9),
        jnp.int32(20),
        **extra,
    ), spec


def test_truncate_mode_keeps_free_prefix():
    """drop=False: a sample hitting the obstacle keeps its collision-free
    prefix with zero-velocity padding (trajectory_sampler.cpp:157-168)."""
    res_drop, _ = _truncate_scenario(drop=True)
    res_trunc, _ = _truncate_scenario(drop=False)
    # with drop: straight fast samples are inadmissible -> fewer admissible
    assert int(res_trunc.num_admissible) >= int(res_drop.num_admissible)
    vels = np.asarray(res_trunc.velocities)
    path = np.asarray(res_trunc.path)
    # the winning truncated sample must never pass the obstacle surface
    assert np.max(path[:, 0]) < 1.0 - 0.2
    # if the winner was truncated, its tail velocities are exactly zero
    if np.any(vels[:, 0] == 0.0):
        first_zero = int(np.argmax(vels[:, 0] == 0.0))
        assert np.all(vels[first_zero:, 0] == 0.0)
        # frozen path tail: all equal
        assert np.allclose(path[first_zero + 1 :, 0], path[first_zero + 1, 0])


def test_adaptive_horizon_shrinks_on_curvature():
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.5]),
    )
    config = DWAConfig(
        prediction_horizon=30,
        control_horizon=2,
        control_time_step=0.1,
        curvature_horizon_tolerance=0.5,
    )
    dwa = DWA(robot=robot, ctrl_limits=_limits(), config=config)
    # tight arc: radius 0.3 -> curvature ~3.3 > tolerance
    theta = np.linspace(0, np.pi, 60)
    path = np.stack([0.3 * np.sin(theta), 0.3 * (1 - np.cos(theta))], axis=1)
    dwa.set_path(path)
    dwa.set_current_state(0.0, 0.0, 0.0)
    dwa.determine_target()
    dwa._adapt_prediction_horizon()
    assert dwa._active_points < dwa._max_points
    # sagitta bound T <= sqrt(8 * tol / kappa) / v_max: discrete curvature
    # of the resampled arc can spike above the analytic 1/R, so the actual
    # horizon is <= the analytic cap (and >= the 2-step floor)
    analytic_cap = np.sqrt(8 * 0.5 / (1 / 0.3)) / 1.0
    assert 2 <= dwa._active_points <= int(analytic_cap / 0.1)

    # straight path restores the full horizon
    dwa.set_path(np.array([[0.0, 0.0], [5.0, 0.0]]))
    dwa.set_current_state(0.0, 0.0, 0.0)
    dwa.determine_target()
    dwa._adapt_prediction_horizon()
    assert dwa._active_points == dwa._max_points


def test_rotate_in_place_turns_toward_path():
    """Diff-drive robot facing away from the path must rotate TOWARD it
    (sign corrected vs the reference's dwa.h:202 — see PARITY.md #7)."""
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.5]),
    )
    config = DWAConfig(
        prediction_horizon=10, control_horizon=2, control_time_step=0.1
    )
    dwa = DWA(robot=robot, ctrl_limits=_limits(), config=config)
    dwa.set_path(np.array([[0.0, 0.0], [3.0, 0.0]]))  # path heading 0
    # facing +y (heading error -pi/2, beyond the 10x tolerance)
    dwa.set_current_state(0.0, 0.0, np.pi / 2)
    res = dwa.compute_velocity_commands((0.0, 0.0, 0.0), laser_scan=LaserScanData())
    assert res.is_found
    omega = res.trajectory.omega[0]
    assert omega < 0.0, "must rotate clockwise toward heading 0"
    # converges in closed loop
    yaw = np.pi / 2
    for _ in range(40):
        dwa.set_current_state(0.0, 0.0, yaw)
        res = dwa.compute_velocity_commands((0.0, 0.0, 0.0), laser_scan=LaserScanData())
        yaw += float(res.trajectory.omega[0]) * 0.1
    assert abs(yaw) < 0.3


def test_device_window_matches_host_window():
    """Fleet device-window mode must agree with the host float64 walk."""
    import dataclasses
    from kompass_core_tpu.ops.solver import (
        get_packed_dwa_solver, make_packed_dwa_solver, pack_solver_input,
        packed_input_size, unpack_solver_output,
    )
    spec_h = SolverSpec(is_omni=False, n_vx=5, n_vy=1, n_omega=5,
                        max_points=10, num_ctrl_points=2, scan_size=32,
                        seg_size=64)
    spec_d = dataclasses.replace(spec_h, device_window=True)
    limits = _limits().to_array()
    limits[3:6] = 0.0
    vel = (0.42, 0.0, -0.13)
    window = sample_velocity_window(vel, limits, 0.1, 5, 1, 5, False)
    n_seg = 40
    seg_x = np.full(64, 1e8, np.float32); seg_x[:n_seg] = np.linspace(0, 3.9, n_seg)
    seg_y = np.full(64, 1e8, np.float32); seg_y[:n_seg] = 0.0
    seg_arc = np.zeros(64, np.float32); seg_arc[:n_seg] = np.linspace(0, 3.9, n_seg)
    obs = np.full((32, 2), 1e8, np.float32); obs[0] = [1.5, 0.3]
    params = np.array([0.1, 0.2, 0.05, 2.0, 1.0, 1.0, 0.0, 0.0, 5.0, 0.0, 3.0, 10/3], np.float32)
    common = dict(params_vec=params, state=(0.0, 0.0, 0.1), obs_xy=obs,
                  obs_count=1, seg_x=seg_x, seg_y=seg_y, seg_arc=seg_arc,
                  seg_count=n_seg, seg_total_len=3.9, ref_total_len=3.9,
                  active_points=10)
    buf_h = np.zeros(packed_input_size(spec_h), np.float32)
    pack_solver_input(spec_h, buf_h, window=window, **common)
    buf_d = np.zeros(packed_input_size(spec_d), np.float32)
    pack_solver_input(spec_d, buf_d, window=None, current_vel=vel,
                      limits_vec=limits, **common)
    out_h = unpack_solver_output(spec_h, np.asarray(get_packed_dwa_solver(spec_h)(buf_h)))
    out_d = unpack_solver_output(spec_d, np.asarray(make_packed_dwa_solver(spec_d)(buf_d)))
    assert out_h[0] == out_d[0]  # found
    assert out_h[2] == out_d[2]  # same winning sample
    np.testing.assert_allclose(out_h[4], out_d[4], rtol=1e-5)  # vx sequence
    assert out_h[1] == pytest.approx(out_d[1], rel=1e-4)


def test_box_collision_passes_tight_corridor():
    """A long narrow BOX robot driving straight through a corridor wider
    than the box but narrower than its circumscribed circle: the exact
    oriented-rectangle check (SolverSpec.collision_box) must admit the
    straight sample; the circle check must drop it (reference FCL uses
    the true body shape, collision_check.h:91-136)."""
    import dataclasses

    import numpy as np

    from kompass_core_tpu.ops.solver import (
        SolverSpec,
        get_packed_dwa_solver,
        pack_solver_input,
        packed_input_size,
        unpack_solver_output,
    )
    from kompass_core_tpu.ops.window import sample_velocity_window
    from kompass_core_tpu.models import (
        AngularCtrlLimits,
        LinearCtrlLimits,
        RobotCtrlLimits,
    )

    # box: 0.8 long x 0.3 wide -> circumscribed radius 0.427
    half = (0.4, 0.15)
    radius = float(np.hypot(*half))
    spec_box = SolverSpec(
        is_omni=False, n_vx=3, n_vy=1, n_omega=3, max_points=10,
        num_ctrl_points=2, scan_size=256, seg_size=64,
        drop_samples=True, collision_box=half,
    )
    spec_circle = dataclasses.replace(spec_box, collision_box=None)

    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=0.5, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(max_vel=0.1, max_acc=3.0, max_decel=3.0),
    ).to_array()
    limits[3:6] = 0.0

    # corridor walls at y = +-0.25: clearance 0.25 > half-width 0.15+margin,
    # but < circumscribed radius 0.427
    xs = np.linspace(-0.5, 2.0, 60)
    wall = np.concatenate([
        np.stack([xs, np.full_like(xs, 0.25)], 1),
        np.stack([xs, np.full_like(xs, -0.25)], 1),
    ]).astype(np.float32)
    obs = np.full((256, 2), 1e8, np.float32)
    obs[: len(wall)] = wall

    n_seg = 40
    s = np.linspace(0, 2.0, n_seg).astype(np.float32)
    seg_x = np.full(64, 1e8, np.float32); seg_x[:n_seg] = s
    seg_y = np.full(64, 1e8, np.float32); seg_y[:n_seg] = 0.0
    seg_arc = np.zeros(64, np.float32); seg_arc[:n_seg] = s

    window = sample_velocity_window((0.4, 0.0, 0.0), limits, 0.1, 3, 1, 3, False)
    params = np.array(
        [0.1, radius, 0.05, 2.0, 1.0, 0.0, 0.0, 0.0, 5.0, 0.0, 3.0, 10 / 3],
        np.float32,
    )

    results = {}
    for name, spec in (("box", spec_box), ("circle", spec_circle)):
        buf = np.zeros(packed_input_size(spec), np.float32)
        pack_solver_input(
            spec, buf, params, (0.0, 0.0, 0.0), window, obs, len(wall),
            seg_x, seg_y, seg_arc, n_seg, float(s[-1]), 2.0, spec.max_points,
        )
        out = np.asarray(get_packed_dwa_solver(spec)(buf))
        found, cost, _b, n_adm, *_ = unpack_solver_output(spec, out)
        results[name] = (found, n_adm)

    assert results["box"][0], "box robot must find a path through"
    assert results["box"][1] > 0
    assert not results["circle"][0], (
        "circumscribed circle must block the corridor "
        f"(got {results['circle']})"
    )


def test_device_window_tiny_grid_packed_layout():
    """The packed window block must hold the 12-float (vel | limits)
    payload even when the sample grid is tiny — spilling into the
    obstacle region would feed obstacle coordinates back as
    acceleration limits."""
    import dataclasses

    from kompass_core_tpu.ops.solver import (
        _unpack_and_solve,
        pack_solver_input,
        packed_input_size,
    )

    spec = SolverSpec(
        is_omni=False, n_vx=3, n_vy=1, n_omega=1, max_points=8,
        num_ctrl_points=2, scan_size=32, seg_size=64, drop_samples=True,
        device_window=True,
    )
    assert packed_input_size(spec) >= 20 + 12 + 2 * 32 + 3 * 64 - 10
    limits = _limits().to_array()
    limits[3:6] = 0.0
    params = np.array(
        [0.1, 0.2, 0.05, 1.0, 1.0, 0.0, 0.0, 0.0, 5.0, 0.0, 3.0, 10 / 3],
        np.float32,
    )
    obs = np.full((32, 2), 1e8, np.float32)
    n_seg = 30
    seg_x = np.full(64, 1e8, np.float32)
    seg_y = np.full(64, 1e8, np.float32)
    seg_arc = np.zeros(64, np.float32)
    seg_x[:n_seg] = np.linspace(0, 2.9, n_seg)
    seg_y[:n_seg] = 0.0
    seg_arc[:n_seg] = np.linspace(0, 2.9, n_seg)
    buf = np.zeros(packed_input_size(spec), np.float32)
    pack_solver_input(
        spec, buf, params, (0.0, 0.0, 0.0), None, obs, 0,
        seg_x, seg_y, seg_arc, n_seg, 2.9, 2.9, 8,
        current_vel=(0.5, 0.0, 0.0), limits_vec=limits,
    )
    out = np.asarray(_unpack_and_solve(spec, jnp.asarray(buf)))
    # found with a forward command toward the straight path
    assert out[0] > 0.5
    # winning vx must respect the (intact) limits: within [v0-dec*dt, hi]
    vx_cmd = out[4]
    assert 0.0 <= vx_cmd <= 1.0 + 1e-5


def test_path_cost_degenerate_single_point_segment():
    """seg_total_len == 0 (robot at the path end, laterally offset) must
    NOT blow every cost to inf/NaN and return an arbitrary winner."""
    spec = SolverSpec(
        is_omni=False, n_vx=3, n_vy=1, n_omega=3, max_points=8,
        num_ctrl_points=2, scan_size=32, seg_size=64, drop_samples=True,
    )
    limits = _limits().to_array()
    limits[3:6] = 0.0
    window = sample_velocity_window(
        (0.3, 0.0, 0.0), limits, 0.1, 3, 1, 3, False
    )
    obs = np.full((32, 2), 1e8, np.float32)
    seg_x = np.full(64, 1e8, np.float32)
    seg_y = np.full(64, 1e8, np.float32)
    seg_arc = np.zeros(64, np.float32)
    seg_x[0], seg_y[0] = 5.0, 0.0  # single-point segment
    params = SolverParams.create(
        time_step=0.1, robot_radius=0.2, collision_margin=0.05,
        weights={
            "reference_path_distance_weight": 2.0,
            "goal_distance_weight": 1.0,
            "obstacles_distance_weight": 0.0,
            "smoothness_weight": 0.0,
            "jerk_weight": 0.0,
        },
        acc_limits=(5.0, 0.0, 3.0), max_obstacles_dist=10 / 3,
    )
    res = dwa_solve(
        spec, params, jnp.array([5.0, 0.5, 0.0], jnp.float32), window,
        jnp.asarray(obs), jnp.int32(0), jnp.asarray(seg_x),
        jnp.asarray(seg_y), jnp.asarray(seg_arc), jnp.int32(1),
        jnp.float32(0.0), jnp.float32(10.0), jnp.int32(8),
    )
    costs = np.asarray(res.costs)
    assert np.isfinite(costs).any()
    assert np.isfinite(float(res.cost))
    # the winner must actually be the argmin of finite costs, not slot 0
    assert int(res.best_index) == int(np.nanargmin(
        np.where(np.isfinite(costs), costs, np.inf)
    ))


def test_dwa_empty_local_map_plans_obstacle_free():
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.5]),
    )
    config = DWAConfig(
        max_linear_samples=4, max_angular_samples=4,
        prediction_horizon=10, control_horizon=2, control_time_step=0.1,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=3.0, goal_distance_weight=1.0,
            smoothness_weight=0.0, jerk_weight=0.0,
            obstacles_distance_weight=0.0,
        ),
    )
    dwa = DWA(robot=robot, ctrl_limits=_limits(), config=config)
    dwa.set_path(np.array([[0.0, 0.0], [2.0, 0.0]]))
    res = dwa.compute_velocity_commands(
        (0.3, 0.0, 0.0), map_points_world=np.array([])
    )
    assert res.is_found


def test_debug_solver_parses_device_window_buffers():
    """dwa_sample_debug must parse device-window packed buffers with the
    same layout as the production solver (review-fix regression: it
    previously read the host grid layout and mis-offset the obstacle and
    segment regions)."""
    import jax.numpy as jnp

    from kompass_core_tpu.ops.solver import (
        SolverSpec,
        _HDR,
        _window_block_size,
        dwa_sample_debug,
        get_packed_dwa_solver,
        packed_input_size,
        unpack_solver_output,
    )

    spec = SolverSpec(
        is_omni=False,
        n_vx=3,
        n_vy=1,
        n_omega=3,  # 2*(3+1+3)=14 >= 12, exercises the shared offset
        max_points=6,
        num_ctrl_points=2,
        scan_size=64,
        seg_size=64,
        drop_samples=True,
        device_window=True,
    )
    buf = np.zeros(packed_input_size(spec), np.float32)
    buf[0:3] = (0.0, 0.0, 0.0)  # state
    buf[3] = 4  # obs_count
    buf[4] = 32  # seg_count
    buf[5] = 1.0  # seg_total_len
    buf[6] = 2.0  # ref_total_len
    buf[7] = spec.max_points
    buf[8:20] = (0.1, 0.2, 0.05, 2.0, 1.0, 1.0, 0.0, 0.0, 3.0, 0.0, 3.0, 3.0)
    o = _HDR
    buf[o : o + 3] = (0.3, 0.0, 0.0)  # current vel
    buf[o + 3 : o + 12] = (1.0, 5.0, 10.0, 0.0, 0.0, 0.0, 2.0, 3.0, 3.0)
    o += _window_block_size(spec)
    r = spec.scan_size
    buf[o : o + 2 * r] = 1e8  # no obstacles nearby
    buf[o : o + 4] = (5.0, 5.1, 5.2, 5.3)  # 4 obstacle xs far off-path
    buf[o + r : o + r + 4] = (5.0, 5.0, 5.0, 5.0)
    o += 2 * r
    g = spec.seg_size
    s = 0.05 * np.arange(32, dtype=np.float32)
    buf[o : o + g] = 1e8
    buf[o : o + 32] = s  # seg_x straight ahead
    buf[o + g : o + 2 * g] = 1e8
    buf[o + g : o + g + 32] = 0.0
    buf[o + 2 * g : o + 2 * g + 32] = s

    out = np.asarray(get_packed_dwa_solver(spec)(buf))
    found, cost, best, _n, *_ = unpack_solver_output(spec, out)
    assert found
    px, py, costs, admissible = dwa_sample_debug(spec, jnp.asarray(buf))
    costs = np.asarray(costs)
    # the debug view must agree with the production solve on the same buffer
    assert int(np.argmin(costs)) == int(best)
    np.testing.assert_allclose(float(np.min(costs)), cost, rtol=1e-6)
    assert np.asarray(admissible).any()


def test_packed_solver_rejects_dynamic_box():
    from kompass_core_tpu.ops.solver import SolverSpec, make_packed_dwa_solver

    spec = SolverSpec(
        is_omni=False, n_vx=3, n_vy=1, n_omega=3, max_points=6,
        num_ctrl_points=2, scan_size=64, seg_size=64, dynamic_box=True,
    )
    with pytest.raises(ValueError):
        make_packed_dwa_solver(spec)


def test_device_window_zero_axis_survives_velocity_noise():
    """A zeroed vy axis (non-omni robot in a mixed fleet) must keep its
    vy=0 slot valid even when odometry reports a tiny nonzero vy
    (review-fix regression: lo > hi emptied the whole axis)."""
    import jax.numpy as jnp

    from kompass_core_tpu.ops.solver import SolverSpec, _device_window

    spec = SolverSpec(
        is_omni=True, n_vx=3, n_vy=3, n_omega=3, max_points=6,
        num_ctrl_points=2, scan_size=64, seg_size=64, device_window=True,
    )
    limits = jnp.asarray(
        [1.0, 5.0, 10.0, 0.0, 0.0, 0.0, 2.0, 3.0, 3.0], jnp.float32
    )
    window = _device_window(
        spec, jnp.asarray([0.3, 1e-6, 0.0]), limits, jnp.float32(0.1)
    )
    vy_mask = np.asarray(window.vy_mask)
    vy_vals = np.asarray(window.vy_vals)
    assert vy_mask[0], "vy=0 slot must stay valid under velocity noise"
    assert abs(float(vy_vals[0])) < 1e-6


def test_pack_solver_input_rejects_window_mode_mismatch():
    """round-5 review: the wrong window/device_window combination used
    to write a silently misaligned buffer (parsed as a nonsense
    velocity grid); both directions must raise."""
    import dataclasses

    import pytest

    from kompass_core_tpu.ops.solver import (
        SolverSpec, pack_solver_input, packed_input_size,
    )

    spec = SolverSpec(
        is_omni=False, n_vx=3, n_vy=1, n_omega=3, max_points=6,
        num_ctrl_points=3, scan_size=16, seg_size=8, drop_samples=True,
    )
    dev_spec = dataclasses.replace(spec, device_window=True)
    buf = np.zeros(packed_input_size(dev_spec), np.float32)
    common = dict(
        params_vec=np.zeros(12, np.float32), state=(0.0, 0.0, 0.0),
        obs_xy=np.zeros((16, 2), np.float32), obs_count=0,
        seg_x=np.zeros(8, np.float32), seg_y=np.zeros(8, np.float32),
        seg_arc=np.zeros(8, np.float32), seg_count=2,
        seg_total_len=1.0, ref_total_len=1.0, active_points=6,
    )
    with pytest.raises(ValueError, match="device_window"):
        pack_solver_input(
            dev_spec, buf, window=object(), **common
        )
    with pytest.raises(ValueError, match="device_window"):
        pack_solver_input(
            spec, np.zeros(packed_input_size(spec), np.float32),
            window=None, current_vel=(0.0, 0.0, 0.0),
            limits_vec=np.zeros(9, np.float32), **common
        )
