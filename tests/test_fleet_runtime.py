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
