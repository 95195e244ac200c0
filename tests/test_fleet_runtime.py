"""FleetRuntime closed-loop test: 32 robots on the 8-device CPU mesh."""

import numpy as np
import pytest

from kompass_core_tpu.control import DWAConfig, TrajectoryCostsWeights
from kompass_core_tpu.datatypes import LaserScanData
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)
from kompass_core_tpu.parallel import FleetRuntime, build_fleet_mesh


def test_fleet_runtime_closed_loop():
    n_robots = 32
    robots = [
        Robot(
            robot_type=RobotType.ACKERMANN,
            geometry_type=RobotGeometry.Type.CYLINDER,
            geometry_params=np.array([0.1, 0.4]),
        )
        for _ in range(n_robots)
    ]
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=4.0, max_acc=3.0, max_decel=3.0, max_steer=np.pi
        ),
    )
    config = DWAConfig(
        max_linear_samples=4,
        max_angular_samples=4,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=3.0,
            goal_distance_weight=1.0,
            smoothness_weight=0.0,
            jerk_weight=0.0,
            obstacles_distance_weight=0.0,
        ),
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=0.1,
    )
    mesh = build_fleet_mesh()
    fleet = FleetRuntime(robots, limits, config, mesh=mesh)

    # each robot gets its own straight path from its spawn
    paths = []
    for i, robot in enumerate(robots):
        x0 = 0.5 * i
        robot.state.x, robot.state.y, robot.state.yaw = x0, 0.0, np.pi / 2
        paths.append(np.array([[x0, 0.0], [x0, 2.5]]))
    fleet.set_paths(paths)

    scan = LaserScanData()
    scans = [scan] * n_robots
    dt = 0.1
    reached = np.zeros(n_robots, bool)
    for _tick in range(60):
        states = [r.state for r in robots]
        results = fleet.tick(states, scans)
        for i, (robot, res) in enumerate(zip(robots, results)):
            if res.get("reason") == "goal_reached":
                reached[i] = True
                continue
            if res["found"]:
                robot.set_control(
                    velocity_x=res["vx"], velocity_y=res["vy"], omega=res["omega"]
                )
                robot.get_state(dt=dt)
        if reached.all():
            break
    assert reached.sum() >= n_robots - 1, (
        f"only {reached.sum()}/{n_robots} robots reached their goals"
    )
    assert fleet.last_tick_seconds < 5.0


def _small_runtime():
    robots = [
        Robot(
            robot_type=RobotType.DIFFERENTIAL_DRIVE,
            geometry_type=RobotGeometry.Type.CYLINDER,
            geometry_params=np.array([0.1, 0.4]),
        )
        for _ in range(4)
    ]
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(max_vel=2.0, max_acc=3.0, max_decel=3.0),
    )
    config = DWAConfig(
        max_linear_samples=4,
        max_angular_samples=4,
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=0.1,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=3.0,
            goal_distance_weight=1.0,
            smoothness_weight=0.0,
            jerk_weight=0.0,
            obstacles_distance_weight=0.0,
        ),
    )
    rt = FleetRuntime(robots, limits, config)
    paths = []
    for i, robot in enumerate(robots):
        robot.state.x = 0.5 * i
        paths.append(np.array([[0.5 * i, 0.0], [0.5 * i + 2.0, 0.0]]))
    rt.set_paths(paths)
    states = [r.state for r in robots]
    scans = [LaserScanData()] * 4
    return rt, states, scans


def test_fleet_runtime_failsafe_stop(monkeypatch):
    """A failing device dispatch is retried once; persistent failure
    degrades the tick to safe-stop commands instead of raising."""
    rt, states, scans = _small_runtime()
    rt.tick(states, scans)  # warm: builds the solver

    calls = {"n": 0}

    def boom(_):
        calls["n"] += 1
        raise RuntimeError("device lost")

    monkeypatch.setattr(rt, "_solver", boom)
    results = rt.tick(states, scans)
    assert calls["n"] == 2  # retried exactly once
    assert rt.solver_failures == 2
    for r in results:
        if r.get("reason") == "solver_error":
            assert r["vx"] == 0.0 and r["omega"] == 0.0 and not r["found"]
    assert any(r.get("reason") == "solver_error" for r in results)


def test_fleet_runtime_rejects_mismatched_lengths():
    """A per-robot ctrl_limits list (or paths list) of the wrong length
    must fail at construction, not IndexError at the first tick."""
    import pytest

    rt, _, _ = _small_runtime()
    robots = [c.robot for c in rt.controllers]
    lim = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(max_vel=2.0, max_acc=3.0, max_decel=3.0),
    )
    with pytest.raises(ValueError):
        FleetRuntime(robots, [lim] * (len(robots) - 1), rt.controllers[0].config)
    with pytest.raises(ValueError):
        rt.set_paths([np.array([[0.0, 0.0], [1.0, 0.0]])])


def test_fleet_runtime_rebuilds_for_larger_scan_bucket():
    """A later tick with a longer scan must rebuild the solver for the
    larger bucket instead of silently truncating obstacle points to the
    first tick's scan_size."""
    rt, states, _ = _small_runtime()
    small = [
        LaserScanData(
            ranges=np.full(120, 5.0),
            angles=np.linspace(0, 2 * np.pi, 120, endpoint=False),
        )
    ] * rt.num_robots
    rt.tick(states, small)
    first_size = rt._spec.scan_size
    big = [
        LaserScanData(
            ranges=np.full(480, 5.0),
            angles=np.linspace(0, 2 * np.pi, 480, endpoint=False),
        )
    ] * rt.num_robots
    rt.tick(states, big)
    assert rt._spec.scan_size > first_size
    assert rt._spec.scan_size >= 480
