"""Device-resident fleet (v2) tests: closed loop + parity with the host
runtime."""

import numpy as np
import pytest

import jax

from kompass_core_tpu.control import DWAConfig, TrajectoryCostsWeights
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)
from kompass_core_tpu.parallel import build_fleet_mesh
from kompass_core_tpu.parallel.fleet_v2 import DeviceFleet

N_RAYS = 72


def _make(n_robots, robot_type=RobotType.DIFFERENTIAL_DRIVE, mesh=None):
    robots = [
        Robot(
            robot_type=robot_type,
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
    fleet = DeviceFleet(
        robots, limits, config, scan_rays=N_RAYS, path_capacity=512,
        max_segments=16, mesh=mesh,
    )
    return robots, fleet


def _run_closed_loop(robots, fleet, paths, max_ticks=80):
    fleet.set_paths(paths)
    angles = np.linspace(0, 2 * np.pi, N_RAYS, endpoint=False)
    ranges = np.full((len(robots), N_RAYS), 10.0)
    dt = 0.1
    for _ in range(max_ticks):
        states = np.array(
            [[r.state.x, r.state.y, r.state.yaw, r.state.speed] for r in robots]
        )
        vels = np.array(
            [[r.state.vx, r.state.vy, r.state.omega] for r in robots]
        )
        out = fleet.tick(states, vels, ranges, angles)
        if out["reached"].all():
            return True, out
        for r, vx, vy, om, found in zip(
            robots, out["vx"], out["vy"], out["omega"], out["found"]
        ):
            if found:
                r.set_control(velocity_x=vx, velocity_y=vy, omega=om)
                r.get_state(dt=dt)
    return bool(out["reached"].all()), out


def test_device_fleet_reaches_goals():
    robots, fleet = _make(12, mesh=build_fleet_mesh())
    paths = []
    for i, r in enumerate(robots):
        x0 = 1.0 * i
        r.state.x, r.state.y, r.state.yaw = x0, 0.0, np.pi / 2
        paths.append(np.array([[x0, 0.0], [x0, 2.5]]))
    done, out = _run_closed_loop(robots, fleet, paths)
    assert done, f"not all reached: {out['reached']}"
    for r, p in zip(robots, paths):
        assert np.hypot(r.state.x - p[-1, 0], r.state.y - p[-1, 1]) < 0.3


def test_device_fleet_rotate_in_place_first():
    """Diff-drive robots facing away must rotate toward the path before
    driving (on-device rotate-in-place branch)."""
    robots, fleet = _make(4)
    paths = []
    for i, r in enumerate(robots):
        x0 = 2.0 * i
        r.state.x, r.state.y, r.state.yaw = x0, 0.0, np.pi  # facing -x
        paths.append(np.array([[x0, 0.0], [x0 + 2.0, 0.0]]))  # path +x
    fleet.set_paths(paths)
    angles = np.linspace(0, 2 * np.pi, N_RAYS, endpoint=False)
    ranges = np.full((4, N_RAYS), 10.0)
    states = np.array(
        [[r.state.x, r.state.y, r.state.yaw, 0.0] for r in robots]
    )
    out = fleet.tick(states, np.zeros((4, 3)), ranges, angles)
    assert out["found"].all()
    # pure rotation: no translation, |omega| > 0
    np.testing.assert_allclose(out["vx"], 0.0, atol=1e-6)
    assert np.all(np.abs(out["omega"]) > 0.1)
    done, _ = _run_closed_loop(robots, fleet, paths)
    assert done


def test_device_fleet_matches_host_runtime_commands():
    """First-tick commands must match the host FleetRuntime (same follower
    semantics on both sides)."""
    from kompass_core_tpu.parallel import FleetRuntime
    from kompass_core_tpu.datatypes import LaserScanData

    n = 6
    robots, fleet = _make(n, robot_type=RobotType.ACKERMANN)
    host_robots = [
        Robot(
            robot_type=RobotType.ACKERMANN,
            geometry_type=RobotGeometry.Type.CYLINDER,
            geometry_params=np.array([0.1, 0.4]),
        )
        for _ in range(n)
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
    host = FleetRuntime(host_robots, limits, config)
    paths = []
    angles = np.linspace(0, 2 * np.pi, N_RAYS, endpoint=False)
    for i, (r, hr) in enumerate(zip(robots, host_robots)):
        x0 = 1.5 * i
        for rr in (r, hr):
            rr.state.x, rr.state.y, rr.state.yaw = x0 + 0.1, 0.05, np.pi / 2 + 0.2
        paths.append(np.array([[x0, 0.0], [x0 + 0.3, 2.5]]))
    fleet.set_paths(paths)
    host.set_paths(paths)

    ranges = np.full((n, N_RAYS), 10.0)
    states = np.array(
        [[r.state.x, r.state.y, r.state.yaw, 0.0] for r in robots]
    )
    out_dev = fleet.tick(states, np.zeros((n, 3)), ranges, angles)
    scan = LaserScanData(ranges=np.full(N_RAYS, 10.0), angles=angles)
    out_host = host.tick([r.state for r in host_robots], [scan] * n)
    for i in range(n):
        assert out_dev["found"][i] == out_host[i]["found"]
        assert out_dev["vx"][i] == pytest.approx(out_host[i]["vx"], abs=1e-4)
        assert out_dev["omega"][i] == pytest.approx(
            out_host[i]["omega"], abs=1e-4
        )
