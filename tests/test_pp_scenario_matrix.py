"""PurePursuit closed-loop scenario matrix, mirroring the reference's
``pure_pursuit_test.cpp:21-212`` (test_PurePursuit_All_Scenarios):
{Ackermann, DiffDrive, Omni} x {Straight, UTurn, Circle} x {avoidance
on/off} with the reference's exact limits, config, paths, obstacle
locations, and unicycle state integration (controller_test_helpers.h:12-92).

The reference harness only warns when 1000 steps elapse without reaching
the goal; measured here, Straight and UTurn converge for every robot type
(so we assert goal-reached), while Circle is throttled by the speed
regulator (quirk: curvature integrates from the path start — see
pure_pursuit.py) and cannot finish the 47 m arc in 1000 ticks; for it we
assert steady progress and a clean command stream instead. Avoidance runs
must respect the collision-gate clearance (robot radius + 0.7 * octree
resolution) at every tick.
"""

import math

import numpy as np
import pytest

from kompass_core_tpu.control import (
    FollowingStatus,
    PurePursuit,
    PurePursuitConfig,
)
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotState,
    RobotType,
)

DT = 0.1
MAX_STEPS = 1000


def _straight_path():
    # controller_test_helpers.h:34-40
    return [(x * 0.5, 0.0) for x in range(21)]


def _uturn_path():
    # controller_test_helpers.h:42-61
    pts = [(x * 0.5, 0.0) for x in range(11)]
    r, cx, cy = 5.5, 5.0, 2.5
    a = -math.pi / 2
    while a <= math.pi / 2:
        pts.append((cx + r * math.cos(a), cy + r * math.sin(a)))
        a += 0.2
    x = 5.0
    while x >= 0.0:
        pts.append((x, 5.0))
        x -= 0.5
    return pts


def _circle_path():
    # controller_test_helpers.h:63-72 (3/4 circle, radius 10)
    pts = []
    a = 0.0
    while a <= 1.5 * math.pi:
        pts.append((10.0 * math.cos(a), 10.0 * math.sin(a)))
        a += 0.1
    return pts


def _round_obstacle(x, y, radius=0.3, resolution=0.1):
    # controller_test_helpers.h:75-92
    cloud = [(x, y)]
    r = resolution
    while r <= radius + 1e-9:
        th = 0.0
        while th < 2 * math.pi:
            cloud.append((x + r * math.cos(th), y + r * math.sin(th)))
            th += resolution / r
        r += resolution
    return np.array(cloud)


PATHS = {
    "Straight": _straight_path,
    "UTurn": _uturn_path,
    "Circle": _circle_path,
}
# pure_pursuit_test.cpp:57-63
OBSTACLE_AT = {"Straight": (4.0, 0.0), "UTurn": (10.0, 0.0), "Circle": (5.0, 8.5)}
CONVERGES = {"Straight", "UTurn"}


@pytest.mark.parametrize("avoidance", [False, True])
@pytest.mark.parametrize(
    "robot_type",
    [RobotType.ACKERMANN, RobotType.DIFFERENTIAL_DRIVE, RobotType.OMNI],
)
@pytest.mark.parametrize("path_name", list(PATHS))
def test_pp_scenario(avoidance, robot_type, path_name):
    # pure_pursuit_test.cpp:26-41,65-66
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=2.0, max_decel=2.0),
        omega_limits=AngularCtrlLimits(
            max_vel=0.7, max_acc=2.0, max_decel=2.0, max_steer=1.0
        ),
    )
    cfg = PurePursuitConfig(
        wheel_base=0.34,
        speed_regulation_curvature=0.5,
        speed_regulation_angular=0.5,
        max_point_interpolation_distance=0.05,
        path_segment_length=1.0,
        goal_dist_tolerance=0.3,
        octree_resolution=0.1,
    )
    robot = Robot(
        robot_type=robot_type,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.1, 0.4]),
    )
    ctrl = PurePursuit(robot=robot, ctrl_limits=limits, config=cfg)
    pts = PATHS[path_name]()
    ctrl.set_path(pts)

    x, y = pts[0]
    yaw = math.atan2(pts[1][1] - pts[0][1], pts[1][0] - pts[0][0])
    if path_name == "Circle":
        x += 0.2  # pure_pursuit_test.cpp:103-105 convergence offset
    obstacles = None
    if avoidance:
        obstacles = _round_obstacle(*OBSTACLE_AT[path_name])
        ctrl._obstacles_world = obstacles
    gate_radius = robot.radius + 0.7 * cfg.octree_resolution

    st = RobotState(x=x, y=y, yaw=yaw)
    reached = False
    for _ in range(MAX_STEPS):
        ctrl.set_current_state(st.x, st.y, st.yaw, 0.0)
        ctrl._current_vel = (st.vx, st.vy, st.omega)
        res = ctrl.execute_with_sensor(DT) if avoidance else ctrl.execute(DT)
        if res.status == FollowingStatus.GOAL_REACHED:
            reached = True
            break
        assert res.status == FollowingStatus.COMMAND_FOUND
        v = res.velocity_command
        assert abs(v.vx) <= limits.vx_limits.max_vel + 1e-9
        # NOTE: omega is intentionally unbounded here — the reference PP
        # only passes vx through restrictVelocityTolimits and rescales
        # omega to preserve curvature (pure_pursuit.cpp:115-126); it never
        # clamps omega to maxOmega.
        assert math.isfinite(v.omega)
        # applyControl (controller_test_helpers.h:12-31)
        st.x += (v.vx * math.cos(st.yaw) - v.vy * math.sin(st.yaw)) * DT
        st.y += (v.vx * math.sin(st.yaw) + v.vy * math.cos(st.yaw)) * DT
        st.yaw = (st.yaw + v.omega * DT + math.pi) % (2 * math.pi) - math.pi
        st.vx, st.vy, st.omega = v.vx, v.vy, v.omega
        if obstacles is not None:
            clearance = float(
                np.min(np.hypot(obstacles[:, 0] - st.x, obstacles[:, 1] - st.y))
            )
            assert clearance >= gate_radius - 0.02, clearance

    if path_name in CONVERGES:
        assert reached, f"{robot_type} on {path_name} did not reach the goal"
    else:
        # Circle: speed-regulated below finish pace; require real progress
        path = ctrl.interpolated_path()
        assert ctrl._last_found_index > 0.6 * path.size()
