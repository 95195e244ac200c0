"""Fleet demo: N robots controlled by one sharded device dispatch per tick.

Spawns a row of diff-drive robots, each with its own straight path, and
drives them all with `FleetRuntime` — per-robot follower state on host, one
batched (mesh-sharded) DWA solve per tick. Prints fleet throughput.

Run: PYTHONPATH=. python examples/fleet_demo.py [num_robots]
"""

import sys
import time

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
from kompass_core_tpu.parallel import FleetRuntime, build_fleet_mesh


def main(n_robots: int = 100):
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
        max_linear_samples=8,
        max_angular_samples=8,
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
    fleet = FleetRuntime(robots, limits, config, mesh=build_fleet_mesh())

    paths = []
    for i, robot in enumerate(robots):
        x0 = 1.0 * i
        robot.state.x, robot.state.y, robot.state.yaw = x0, 0.0, np.pi / 2
        paths.append(np.array([[x0, 0.0], [x0, 3.0]]))
    fleet.set_paths(paths)

    scans = [LaserScanData()] * n_robots
    reached = np.zeros(n_robots, bool)
    tick_times = []
    for tick in range(80):
        results = fleet.tick([r.state for r in robots], scans)
        tick_times.append(fleet.last_tick_seconds)
        for i, (robot, res) in enumerate(zip(robots, results)):
            if res.get("reason") == "goal_reached":
                reached[i] = True
            elif res["found"]:
                robot.set_control(
                    velocity_x=res["vx"], velocity_y=res["vy"],
                    omega=res["omega"],
                )
                robot.get_state(dt=0.1)
        if reached.all():
            break
    steady = np.median(tick_times[2:]) if len(tick_times) > 3 else tick_times[-1]
    print(
        f"fleet: {int(reached.sum())}/{n_robots} robots reached goals in "
        f"{len(tick_times)} ticks; steady tick {steady * 1e3:.1f} ms "
        f"({n_robots / steady:,.0f} solves/s incl. host packing)"
    )
    assert reached.sum() >= n_robots - 1
    print("FLEET DEMO PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 100))
