"""Closed-loop DWA integration test.

Mirrors the reference's pytest control loop
(``tests/test_controllers.py:168-254`` run_control + ``:430-464`` test_dwa):
an Ackermann cylinder robot follows a short curved global path with the
canonical config {path weight 3.0, goal weight 1.0, rest 0}, 4x4 samples,
10-step horizon @ 0.1 s, and must reach the end within 100 sim steps.

The path fixture is synthetic (generated, comparable in length/curvature to
the recorded path the reference tests use).
"""

import numpy as np
import pytest

from kompass_core_tpu.control import DWA, DWAConfig, TrajectoryCostsWeights
from kompass_core_tpu.datatypes.laserscan import LaserScanData
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)


def make_global_path():
    """Short gently-curving path, ~4 m, starting near the robot spawn."""
    t = np.linspace(0.0, 1.0, 6)
    x = -0.5 + 2.2 * t**2
    y = 3.3 * t
    return np.stack([x, y], axis=1)


@pytest.fixture
def robot():
    return Robot(
        robot_type=RobotType.ACKERMANN,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.1, 0.4]),
    )


@pytest.fixture
def ctrl_limits():
    return RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=4.0, max_acc=3.0, max_decel=3.0, max_steer=np.pi
        ),
    )


def run_control(controller, global_path, robot, control_time_step, max_steps=100):
    """Apply the controller's control-horizon commands in closed loop until
    the end of the path is reached (reference run_control semantics)."""
    controller.set_path(global_path)
    robot.state.x = float(global_path[0][0])
    robot.state.y = 0.0
    robot.state.yaw = np.pi / 2

    laser_scan = LaserScanData()
    end_reached = False
    i = 0
    while not end_reached and i < max_steps:
        ok = controller.loop_step(current_state=robot.state, laser_scan=laser_scan)
        if not ok:
            end_reached = controller.reached_end()
            break
        for vx, vy, omega in zip(
            controller.linear_x_control,
            controller.linear_y_control,
            controller.angular_control,
        ):
            robot.set_control(velocity_x=vx, velocity_y=vy, omega=omega)
            robot.get_state(dt=control_time_step)
            i += 1
            end_reached = controller.reached_end()
    return end_reached, i


def test_dwa_reaches_goal(robot, ctrl_limits):
    control_time_step = 0.1
    cost_weights = TrajectoryCostsWeights(
        reference_path_distance_weight=3.0,
        goal_distance_weight=1.0,
        smoothness_weight=0.0,
        jerk_weight=0.0,
        obstacles_distance_weight=0.0,
    )
    config = DWAConfig(
        max_linear_samples=4,
        max_angular_samples=4,
        octree_resolution=0.1,
        costs_weights=cost_weights,
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=control_time_step,
    )
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    reached, steps = run_control(
        dwa, make_global_path(), robot, control_time_step
    )
    assert reached, f"DWA did not reach the goal (ran {steps} steps)"


def test_dwa_avoids_head_on_obstacle(robot, ctrl_limits):
    """With an obstacle wall blocking the straight line, samples that collide
    must be dropped and the planner must still find an admissible command."""
    control_time_step = 0.1
    config = DWAConfig(
        max_linear_samples=6,
        max_angular_samples=6,
        octree_resolution=0.1,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=2.0,
            goal_distance_weight=1.0,
            obstacles_distance_weight=1.0,
            smoothness_weight=0.0,
            jerk_weight=0.0,
        ),
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=control_time_step,
    )
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    path = np.array([[0.0, 0.0], [0.0, 3.0]])
    dwa.set_path(path)
    robot.state.x, robot.state.y, robot.state.yaw = 0.0, 0.0, np.pi / 2

    # wall of obstacle points directly ahead at y = 0.45 (within one horizon)
    angles = np.linspace(-0.5, 0.5, 21)  # sensor frame: ahead of the robot
    ranges = np.full_like(angles, 0.45)
    scan = LaserScanData(ranges=ranges, angles=angles)

    dwa.set_current_state(robot.state.x, robot.state.y, robot.state.yaw)
    result = dwa.compute_velocity_commands((0.0, 0.0, 0.0), laser_scan=scan)
    assert result.is_found
    # the winning rollout must stay clear of the wall
    wall_y = 0.45
    clearance = wall_y - np.max(result.trajectory.path_y)
    assert clearance > robot.radius, (
        f"winning trajectory grazes the wall (clearance {clearance:.3f})"
    )


def test_dwa_no_admissible_when_enclosed(robot, ctrl_limits):
    """Fully enclosed by close obstacles -> every sample collides -> no
    command possible (reference drop-samples semantics)."""
    control_time_step = 0.1
    config = DWAConfig(
        max_linear_samples=4,
        max_angular_samples=4,
        octree_resolution=0.1,
        costs_weights=TrajectoryCostsWeights(),
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=control_time_step,
    )
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    dwa.set_path(np.array([[0.0, 0.0], [0.0, 3.0]]))
    dwa.set_current_state(0.0, 0.0, np.pi / 2)

    angles = np.linspace(0, 2 * np.pi, 72, endpoint=False)
    scan = LaserScanData(ranges=np.full_like(angles, 0.12), angles=angles)
    result = dwa.compute_velocity_commands((0.5, 0.0, 0.0), laser_scan=scan)
    assert not result.is_found


def test_debug_velocity_search(robot, ctrl_limits):
    """Debug sampling returns every rollout (reference debugVelocitySearch)."""
    config = DWAConfig(
        max_linear_samples=4, max_angular_samples=4,
        prediction_horizon=10, control_horizon=2, control_time_step=0.1,
    )
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    dwa.set_path(np.array([[0.0, 0.0], [3.0, 0.0]]))
    dwa.set_current_state(0.0, 0.0, 0.0)
    px, py, costs, adm = dwa.debug_velocity_search((0.3, 0.0, 0.0),
                                                   laser_scan=LaserScanData())
    S = px.shape[0]
    assert px.shape == py.shape and costs.shape == (S,) and adm.shape == (S,)
    assert adm.sum() > 0
    # stored for later retrieval
    assert dwa.get_debugging_samples()[0].shape == px.shape


def test_check_states_feasibility(robot, ctrl_limits):
    config = DWAConfig(prediction_horizon=10, control_horizon=2)
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    dwa.set_current_state(0.0, 0.0, 0.0)
    angles = np.array([0.0])
    scan = LaserScanData(ranges=np.array([1.0]), angles=angles)
    from kompass_core_tpu.models import RobotState
    free = [RobotState(x=0.0, y=0.0), RobotState(x=0.0, y=0.5)]
    hit = [RobotState(x=0.95, y=0.0)]
    assert not dwa.check_states_feasibility(free, laser_scan=scan)
    assert dwa.check_states_feasibility(hit, laser_scan=scan)


def test_dwa_pointcloud_and_local_map_inputs(robot, ctrl_limits):
    """All three sensor input paths (reference loop_step dispatch,
    control/dwa.py:298-315) produce consistent avoidance behavior."""
    config = DWAConfig(
        max_linear_samples=6, max_angular_samples=6,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=2.0, goal_distance_weight=1.0,
            obstacles_distance_weight=1.0, smoothness_weight=0.0,
            jerk_weight=0.0,
        ),
        prediction_horizon=10, control_horizon=2, control_time_step=0.1,
    )
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    dwa.set_path(np.array([[0.0, 0.0], [0.0, 3.0]]))
    dwa.set_current_state(0.0, 0.0, np.pi / 2)

    # wall ahead at y=0.45, expressed three ways
    xs = np.linspace(-0.3, 0.3, 21)
    wall_world = np.stack([xs, np.full_like(xs, 0.45)], axis=1)
    # sensor frame (robot at origin facing +y): wall is ahead at x_s=0.45
    wall_sensor = np.stack(
        [np.full_like(xs, 0.45), -xs, np.zeros_like(xs)], axis=1
    ).astype(np.float32)

    from kompass_core_tpu.datatypes import PointCloudData

    r_cloud = dwa.compute_velocity_commands(
        (0.0, 0.0, 0.0), point_cloud=PointCloudData(points=wall_sensor)
    )
    r_map = dwa.compute_velocity_commands(
        (0.0, 0.0, 0.0), map_points_world=wall_world
    )
    for res in (r_cloud, r_map):
        assert res.is_found
        assert np.max(res.trajectory.path_y) < 0.45 - robot.radius

    # loop_step local_map path
    from kompass_core_tpu.models import RobotState
    state = RobotState(x=0.0, y=0.0, yaw=np.pi / 2)
    assert dwa.loop_step(current_state=state, local_map=wall_world)


def test_dwa_empty_scan(robot, ctrl_limits):
    """Zero-ray scan: no obstacles, no collisions, solver still solves."""
    config = DWAConfig(prediction_horizon=10, control_horizon=2)
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    dwa.set_path(np.array([[0.0, 0.0], [3.0, 0.0]]))
    dwa.set_current_state(0.0, 0.0, 0.0)
    scan = LaserScanData(ranges=np.zeros(0), angles=np.zeros(0))
    res = dwa.compute_velocity_commands((0.3, 0.0, 0.0), laser_scan=scan)
    assert res.is_found
    assert res.trajectory.vx[0] > 0.0


@pytest.mark.parametrize(
    "robot_type",
    [RobotType.ACKERMANN, RobotType.DIFFERENTIAL_DRIVE, RobotType.OMNI],
)
@pytest.mark.parametrize("with_obstacles", [False, True])
def test_dwa_scenario_matrix_reaches_goal(
    robot_type, with_obstacles, ctrl_limits
):
    """The reference's closed-loop scenario matrix {robot types x
    obstacle on/off}, goal reached within the step budget (mirrors
    ``dwa_test.cpp:113-161``; its budget is 150 steps)."""
    test_robot = Robot(
        robot_type=robot_type,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.1, 0.4]),
    )
    control_time_step = 0.1
    config = DWAConfig(
        max_linear_samples=5,
        max_angular_samples=5,
        octree_resolution=0.1,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=3.0,
            goal_distance_weight=1.0,
            obstacles_distance_weight=1.0 if with_obstacles else 0.0,
            smoothness_weight=0.0,
            jerk_weight=0.0,
        ),
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=control_time_step,
    )
    dwa = DWA(robot=test_robot, ctrl_limits=ctrl_limits, config=config)

    if with_obstacles:
        # lateral clutter well off the path corridor: present in every
        # solve (obstacle cost active) but not blocking
        angles = np.linspace(np.pi * 0.6, np.pi * 0.9, 15)
        scan = LaserScanData(
            ranges=np.full(15, 1.2), angles=angles
        )
    else:
        scan = LaserScanData()

    controller = dwa
    controller.set_path(make_global_path())
    test_robot.state.x = -0.5
    test_robot.state.y = 0.0
    test_robot.state.yaw = np.pi / 2
    end_reached = False
    i = 0
    while not end_reached and i < 150:
        ok = controller.loop_step(
            current_state=test_robot.state, laser_scan=scan
        )
        if not ok:
            end_reached = controller.reached_end()
            break
        for vx, vy, omega in zip(
            controller.linear_x_control,
            controller.linear_y_control,
            controller.angular_control,
        ):
            test_robot.set_control(velocity_x=vx, velocity_y=vy, omega=omega)
            test_robot.get_state(dt=control_time_step)
            i += 1
            end_reached = controller.reached_end()
    assert end_reached, (
        f"{robot_type} obstacles={with_obstacles}: goal not reached in {i}"
        " steps"
    )


def test_nan_pointcloud_does_not_disable_collision(robot, ctrl_limits):
    """One NaN point in a cloud must not defeat collision admissibility
    or poison costs (review-fix regression, reproduced: found=True,
    cost=nan, wall ignored)."""
    from kompass_core_tpu.datatypes import PointCloudData

    control_time_step = 0.1
    config = DWAConfig(
        max_linear_samples=6,
        max_angular_samples=6,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=2.0,
            goal_distance_weight=1.0,
            obstacles_distance_weight=1.0,
            smoothness_weight=0.0,
            jerk_weight=0.0,
        ),
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=control_time_step,
    )
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    dwa.set_path(np.array([[0.0, 0.0], [0.0, 3.0]]))
    robot.state.x, robot.state.y, robot.state.yaw = 0.0, 0.0, np.pi / 2
    dwa.set_current_state(0.0, 0.0, np.pi / 2)

    # wall of points directly ahead + one NaN dropout in the cloud
    ys = np.full(21, 0.45)
    xs = np.linspace(-0.5, 0.5, 21)
    pts = np.stack([ys, -xs, np.zeros(21)], axis=1).astype(np.float32)
    # sensor frame: x forward -> wall at x=0.45 ahead of a +pi/2-facing
    # robot in world frame
    pts = np.concatenate(
        [pts, np.array([[np.nan, np.nan, 0.0]], np.float32)]
    )
    result = dwa.compute_velocity_commands(
        (0.0, 0.0, 0.0), point_cloud=PointCloudData(points=pts)
    )
    assert result.is_found
    assert np.isfinite(result.cost), "NaN point poisoned the costs"
    clearance = 0.45 - np.max(result.trajectory.path_y)
    assert clearance > robot.radius, (
        f"NaN point disabled collision (clearance {clearance:.3f})"
    )


def test_map_points_world_accepts_single_point(robot, ctrl_limits):
    """A 1-D [x, y] local-map input must not crash into a swallowed
    IndexError (review-fix regression)."""
    config = DWAConfig(
        max_linear_samples=4,
        max_angular_samples=4,
        prediction_horizon=8,
        control_horizon=2,
        control_time_step=0.1,
    )
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    from kompass_core_tpu.models import RobotState

    dwa.set_path(np.array([[0.0, 0.0], [2.0, 0.0]]))
    ok = dwa.loop_step(
        current_state=RobotState(x=0.0, y=0.0, yaw=0.0),
        local_map=np.array([5.0, 5.0]),
    )
    assert ok


def test_debug_velocity_search_sees_local_map(robot, ctrl_limits):
    """debug_velocity_search accepts map_points_world so debug rankings
    match the executed command's scene (review-fix regression: the debug
    solve previously ran obstacle-free for local-map users)."""
    config = DWAConfig(
        max_linear_samples=6,
        max_angular_samples=6,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=2.0,
            goal_distance_weight=1.0,
            obstacles_distance_weight=1.0,
        ),
        prediction_horizon=10,
        control_horizon=2,
        control_time_step=0.1,
    )
    dwa = DWA(robot=robot, ctrl_limits=ctrl_limits, config=config)
    dwa.set_path(np.array([[0.0, 0.0], [0.0, 3.0]]))
    dwa.set_current_state(0.0, 0.0, np.pi / 2)
    wall = np.stack(
        [np.linspace(-0.5, 0.5, 21), np.full(21, 0.45)], axis=1
    )
    _px, py, costs, adm = dwa.debug_velocity_search(
        (0.0, 0.0, 0.0), map_points_world=wall
    )
    # with the wall in view, some samples must be inadmissible
    assert not np.asarray(adm).all()
    _px2, _py2, costs_free, adm_free = dwa.debug_velocity_search(
        (0.0, 0.0, 0.0)
    )
    assert np.asarray(adm_free).sum() > np.asarray(adm).sum()
