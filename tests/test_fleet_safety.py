"""Safety-fused fleet tick: the critical-zone emergency stop gate runs
INSIDE the compiled fleet program (ops/fleet_solver.FleetSafety).

The reference stack drives its ``CriticalZoneChecker``
(``critical_zone_check.cpp:87-119``) as a separate per-tick call beside
the controller; here the same masked-min factor gates every command on
device — including every tick of the k-tick on-device serving loop,
which otherwise executes open-loop with no safety check at all.
"""

import numpy as np

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
from kompass_core_tpu.parallel import build_fleet_mesh
from kompass_core_tpu.parallel.fleet_v2 import DeviceFleet, FleetSafetyConfig
from kompass_core_tpu.utils.emergency_stop import EmergencyChecker

N_RAYS = 72
ANGLES = np.arange(N_RAYS) * (2 * np.pi / N_RAYS)


def _robots(n):
    return [
        Robot(
            robot_type=RobotType.DIFFERENTIAL_DRIVE,
            geometry_type=RobotGeometry.Type.CYLINDER,
            geometry_params=np.array([0.1, 0.4]),
        )
        for _ in range(n)
    ]


def _limits():
    return RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=4.0, max_acc=3.0, max_decel=3.0, max_steer=np.pi
        ),
    )


def _config():
    return DWAConfig(
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


def _fleet(n, safety=None, mesh=None, **kw):
    return DeviceFleet(
        _robots(n), _limits(), _config(), scan_rays=N_RAYS,
        path_capacity=512, max_segments=16, safety_config=safety,
        mesh=mesh, **kw,
    )


def _scan_with_obstacle_ahead(dist):
    """Full-ring scan, one return straight ahead at ``dist``."""
    ranges = np.full(N_RAYS, 10.0, np.float32)
    ranges[0] = dist
    return ranges


def _tick_once(fleet, ranges, n=1, goal_x=3.0):
    fleet.set_paths([np.array([[0.0, 0.0], [goal_x, 0.0]])] * n)
    states = np.tile([0.0, 0.0, 0.0, 0.0], (n, 1))
    vels = np.zeros((n, 3))
    return fleet.tick(states, vels, np.tile(ranges, (n, 1)), ANGLES)


def test_safety_factor_matches_emergency_checker():
    """Single-tick path: the fused beam-form factor is arithmetic-
    identical to the standalone checker on the same scan."""
    # surface distance = range - radius (0.1); slowdown band is
    # surface in (0.3, 0.6) -> ranges in (0.4, 0.7)
    for dist in (0.45, 0.38, 0.65, 2.0):
        ranges = _scan_with_obstacle_ahead(dist)
        fleet = _fleet(1, safety=FleetSafetyConfig())
        out = _tick_once(fleet, ranges)
        checker = EmergencyChecker(
            robot=_robots(1)[0],
            emergency_distance=0.3,
            slowdown_distance=0.6,
            emergency_angle=160.0,
        )
        scan = LaserScanData(
            angles=ANGLES.copy(), ranges=ranges.astype(np.float64)
        )
        expected = checker.run(scan=scan, forward=True)
        got = float(out["safety_factor"][0])
        assert abs(got - expected) < 1e-5, (dist, got, expected)
        if 0.4 < dist < 0.7:
            assert 0.0 < got < 1.0


def test_safety_scales_linear_command():
    """Commands with safety == commands without safety x factor (the gate
    multiplies the chosen command; it does not change the choice)."""
    ranges = _scan_with_obstacle_ahead(0.45)
    out_safe = _tick_once(_fleet(1, safety=FleetSafetyConfig()), ranges)
    out_plain = _tick_once(_fleet(1), ranges)
    f = float(out_safe["safety_factor"][0])
    assert 0.0 < f < 1.0
    np.testing.assert_allclose(
        out_safe["vx"], out_plain["vx"] * f, rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        out_safe["omega"], out_plain["omega"], rtol=1e-6, atol=1e-7
    )
    assert float(out_plain["safety_factor"][0]) == 1.0  # shape-stable field


def test_safety_critical_stop_zeroes_whole_twist():
    # full ring inside critical (0.25 - 0.1 < 0.3): both cones blocked,
    # so the stop fires regardless of which direction the solver picks
    # (a single blocking return ahead lets DWA legally REVERSE away —
    # the backward cone is clear and the gate correctly allows it)
    ranges = np.full(N_RAYS, 0.25, np.float32)
    out = _tick_once(_fleet(1, safety=FleetSafetyConfig()), ranges)
    assert float(out["safety_factor"][0]) == 0.0
    assert float(out["vx"][0]) == 0.0
    assert float(out["vy"][0]) == 0.0
    assert float(out["omega"][0]) == 0.0


def test_safety_clear_scan_is_transparent():
    ranges = np.full(N_RAYS, 10.0, np.float32)
    out_safe = _tick_once(_fleet(1, safety=FleetSafetyConfig()), ranges)
    out_plain = _tick_once(_fleet(1), ranges)
    assert float(out_safe["safety_factor"][0]) == 1.0
    for k in ("vx", "vy", "omega", "cost"):
        np.testing.assert_array_equal(out_safe[k], out_plain[k])


def test_safety_per_robot_heterogeneous():
    """Per-robot zone params: same scan, different factors."""
    tight = FleetSafetyConfig(
        critical_distance=0.05, slowdown_distance=0.1
    )
    fleet = _fleet(2, safety=[FleetSafetyConfig(), tight])
    ranges = _scan_with_obstacle_ahead(0.45)
    out = _tick_once(fleet, ranges, n=2)
    assert 0.0 < float(out["safety_factor"][0]) < 1.0
    assert float(out["safety_factor"][1]) == 1.0  # 0.45 - r > 0.1


def test_safety_k_tick_loop_stops_before_wall():
    """The k-tick on-device loop is safety-gated EVERY tick: a robot
    integrating toward a wall hard-stops inside the single dispatch.

    The zone distances are set far larger than the collision margin so
    the stop is attributable to the safety gate, not sample pruning —
    the no-safety control run drives measurably closer."""
    wall_x = 2.0
    ranges = np.full(N_RAYS, 10.0, np.float32)
    # rays that hit the wall plane x = wall_x (|angle| < 60 deg)
    for i, a in enumerate(ANGLES):
        ca = np.cos(a)
        if ca > 0.5:
            ranges[i] = wall_x / ca
    safety = FleetSafetyConfig(
        critical_distance=0.5, slowdown_distance=1.2
    )
    k = 40

    def run(fleet):
        fleet.set_paths([np.array([[0.0, 0.0], [3.5, 0.0]])])
        return fleet.run_ticks_on_device(
            k, np.zeros((1, 4)), np.zeros((1, 3)),
            ranges[None, :], ANGLES,
        )

    out_safe = run(_fleet(1, safety=safety))
    out_plain = run(_fleet(1))
    x_safe = float(out_safe["final_states"][0, 0])
    x_plain = float(out_plain["final_states"][0, 0])
    # stop surface: wall - crit - radius = 2.0 - 0.5 - 0.1 = 1.4
    assert x_safe < 1.5, x_safe
    assert x_plain > x_safe + 0.2, (x_plain, x_safe)
    factors = out_safe["safety_factor"][0]  # [k]
    # the gate scales vx by the factor each tick, so the approach to the
    # stop surface is geometric: factor and speed decay together
    assert factors[0] == 1.0 and factors[-1] < 0.1, factors
    assert np.all(np.diff(factors[8:]) <= 1e-6)  # monotone once in band
    assert abs(float(out_safe["vx"][0, -1])) < 0.05


def test_safety_on_mesh_matches_single_device():
    mesh = build_fleet_mesh()
    ranges = _scan_with_obstacle_ahead(0.45)
    out_mesh = _tick_once(
        _fleet(8, safety=FleetSafetyConfig(), mesh=mesh), ranges, n=8
    )
    out_one = _tick_once(
        _fleet(8, safety=FleetSafetyConfig()), ranges, n=8
    )
    np.testing.assert_allclose(
        out_mesh["safety_factor"], out_one["safety_factor"], rtol=1e-6
    )
    np.testing.assert_allclose(
        out_mesh["vx"], out_one["vx"], rtol=1e-5, atol=1e-6
    )


def test_safety_tick_requires_arg():
    """A tick built with safety=True must refuse to run without the
    FleetSafety tables (a silent factor-1 fallback would be unsafe)."""
    import pytest

    from kompass_core_tpu.ops.fleet_solver import make_fleet_tick

    fleet = _fleet(1, safety=FleetSafetyConfig())
    fn = make_fleet_tick(fleet.spec, safety=True)
    fleet.set_paths([np.array([[0.0, 0.0], [1.0, 0.0]])])
    fleet.set_scan_angles(ANGLES)
    with pytest.raises(ValueError, match="FleetSafety"):
        fn(fleet._paths, fleet._cfg, fleet._carry, fleet._angles,
           np.zeros((fleet._n, 7 + N_RAYS), np.float32))
