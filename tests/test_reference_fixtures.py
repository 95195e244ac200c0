"""The reference's own recorded data driving this engine.

Fixtures copied verbatim (data, not code) from
``/root/reference/tests/resources/`` into ``tests/resources/reference/``:

  * ``control/global_path*.json`` — recorded ROS global plans
    (consumed by the closed-loop tests in the reference's
    ``test_controllers.py:168-254``),
  * ``mapping/laserscan_data.json`` — a recorded 360-ray scan
    (``test_laserscan_emergency_stop.py``),
  * ``mapping/livox_pointcloud_sample_1.json`` — a real recorded Livox
    PointCloud2 frame (20k points, 26-byte stride)
    (``test_local_mapper_pytest.py:397-436``),
  * ``ompl/turtlebot_map.npy`` + ``map_meta.json`` — the turtlebot3 world
    map cloud + metadata (``test_ompl.py:40-80``).

Each test mirrors the reference's scenario and its assertions.
"""

import json
import os

import numpy as np
import pytest

from kompass_core_tpu.control import (
    DVZ,
    DWA,
    DWAConfig,
    PurePursuit,
    Stanley,
    StanleyConfig,
    TrajectoryCostsWeights,
)
from kompass_core_tpu.datatypes import LaserScanData, PointCloudData
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)

RES = os.path.join(os.path.dirname(__file__), "resources", "reference")


# --- fake-ROS stand-ins (reference test_controllers.py:47-81) -------------


class _Position:
    def __init__(self, x, y, z=0.0):
        self.x, self.y, self.z = x, y, z


class _Pose:
    def __init__(self, x, y, z=0.0):
        self.position = _Position(x, y, z)


class _PoseStamped:
    def __init__(self, x, y, z=0.0):
        self.pose = _Pose(x, y, z)


class _RosPath:
    def __init__(self, poses):
        self.poses = poses


def json_to_ros_path(path_file: str) -> _RosPath:
    with open(path_file) as f:
        data = json.load(f)
    return _RosPath(
        [
            _PoseStamped(
                p["pose"]["position"]["x"],
                p["pose"]["position"]["y"],
                p["pose"]["position"].get("z", 0.0),
            )
            for p in data["poses"]
        ]
    )


@pytest.fixture
def my_robot():
    return Robot(
        robot_type=RobotType.ACKERMANN,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.1, 0.4]),
    )


@pytest.fixture
def robot_ctr_limits():
    return RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=4.0, max_acc=3.0, max_decel=3.0, max_steer=np.pi
        ),
    )


@pytest.fixture
def global_path():
    return json_to_ros_path(os.path.join(RES, "control", "global_path.json"))


CONTROL_TIME_STEP = 0.1


def run_control(controller, global_path, robot, control_time_step) -> bool:
    """Reference ``run_control`` (test_controllers.py:168-254): apply each
    command of the control horizon through the kinematic robot sim until
    the recorded path end is reached, <= 100 applications."""
    controller.set_path(global_path)
    robot.state.x = -0.51731912
    robot.state.y = 0.0
    robot.state.yaw = np.pi / 2

    laser_scan = LaserScanData()
    end_reached = False
    i = 0
    while not end_reached and i < 100:
        ok = controller.loop_step(
            current_state=robot.state, laser_scan=laser_scan
        )
        if not ok or not controller.path:
            end_reached = controller.reached_end()
            break
        for vx, vy, omega in zip(
            np.atleast_1d(controller.linear_x_control),
            np.atleast_1d(controller.linear_y_control),
            np.atleast_1d(controller.angular_control),
        ):
            robot.set_control(velocity_x=vx, velocity_y=vy, omega=omega)
            robot.get_state(dt=control_time_step)
            i += 1
            end_reached = controller.reached_end()
    return end_reached


def test_stanley_reaches_recorded_path_end(
    my_robot, robot_ctr_limits, global_path
):
    config = StanleyConfig(cross_track_gain=1.5, heading_gain=2.0)
    stanley = Stanley(
        robot=my_robot,
        ctrl_limits=robot_ctr_limits,
        config=config,
        control_time_step=CONTROL_TIME_STEP,
    )
    assert run_control(stanley, global_path, my_robot, CONTROL_TIME_STEP)


def test_dvz_reaches_recorded_path_end(
    my_robot, robot_ctr_limits, global_path
):
    dvz = DVZ(
        robot=my_robot,
        ctrl_limits=robot_ctr_limits,
        control_time_step=CONTROL_TIME_STEP,
    )
    assert run_control(dvz, global_path, my_robot, CONTROL_TIME_STEP)


def test_dwa_reaches_recorded_path_end(
    my_robot, robot_ctr_limits, global_path
):
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
        control_time_step=CONTROL_TIME_STEP,
        max_num_threads=1,
    )
    dwa = DWA(robot=my_robot, ctrl_limits=robot_ctr_limits, config=config)
    assert run_control(dwa, global_path, my_robot, CONTROL_TIME_STEP)


def test_pure_pursuit_reaches_recorded_path_end(
    my_robot, robot_ctr_limits, global_path
):
    from kompass_core_tpu.control import PurePursuitConfig

    config = PurePursuitConfig(
        wheel_base=my_robot.wheelbase,
        lookahead_gain_forward=1.0,
        # neutralize the curvature-sum speed regulation: per-point
        # curvature spikes at interpolation knots would otherwise pin the
        # speed factor at its minimum (same note as
        # test_classic_controllers.test_pure_pursuit_reaches_goal)
        speed_regulation_curvature=1e-3,
        speed_regulation_angular=1e-3,
    )
    pp = PurePursuit(
        robot=my_robot,
        ctrl_limits=robot_ctr_limits,
        config=config,
        control_time_step=CONTROL_TIME_STEP,
    )
    assert run_control(pp, global_path, my_robot, CONTROL_TIME_STEP)


def test_dwa_reaches_y_axis_recorded_path(my_robot, robot_ctr_limits):
    """The second recorded plan (global_path_y.json, mostly along y)."""
    path = json_to_ros_path(os.path.join(RES, "control", "global_path_y.json"))
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
        control_time_step=CONTROL_TIME_STEP,
    )
    dwa = DWA(robot=my_robot, ctrl_limits=robot_ctr_limits, config=config)
    assert run_control(dwa, path, my_robot, CONTROL_TIME_STEP)


# --- recorded laserscan: mapping + emergency stop -------------------------


@pytest.fixture
def recorded_scan() -> LaserScanData:
    with open(os.path.join(RES, "mapping", "laserscan_data.json")) as f:
        d = json.load(f)
    return LaserScanData(
        angle_min=d["angle_min"],
        angle_max=d["angle_max"],
        angle_increment=d["angle_increment"],
        range_min=d["range_min"],
        range_max=d["range_max"],
        ranges=np.asarray(d["ranges"], np.float64),
    )


def _occupancy_counts(grid):
    from kompass_core_tpu.mapping.local_mapper import EMPTY, OCCUPIED

    return (
        int((grid == OCCUPIED).sum()),
        int((grid == EMPTY).sum()),
        int(((grid != OCCUPIED) & (grid != EMPTY)).sum()),
    )


def test_mapper_recorded_laserscan(recorded_scan):
    from kompass_core_tpu.datatypes import PoseData
    from kompass_core_tpu.datatypes.scan_model import ScanModelConfig
    from kompass_core_tpu.mapping.local_mapper import LocalMapper, MapConfig

    cfg = MapConfig(width=10.0, height=10.0, resolution=0.05)
    mapper = LocalMapper(
        config=cfg,
        scan_model_config=ScanModelConfig(
            angle_step=recorded_scan.angle_increment
        ),
    )
    mapper.update_from_scan(PoseData(), recorded_scan)
    n_occ, n_empty, n_unknown = _occupancy_counts(mapper.occupancy)
    total = mapper.occupancy.size
    assert n_occ + n_empty + n_unknown == total
    # the recorded room: walls around ~2-5 m -> plenty of occupied hits
    # and swept-free interior
    assert n_occ > 50, f"expected recorded walls to stamp cells, got {n_occ}"
    assert n_empty > 2000, "interior should be swept EMPTY"


def test_mapper_recorded_livox_pointcloud():
    from kompass_core_tpu.datatypes import PoseData
    from kompass_core_tpu.datatypes.scan_model import ScanModelConfig
    from kompass_core_tpu.mapping.local_mapper import LocalMapper, MapConfig

    with open(
        os.path.join(RES, "mapping", "livox_pointcloud_sample_1.json")
    ) as f:
        d = json.load(f)
    fields = {fl["name"]: fl for fl in d["fields"]}
    cloud = PointCloudData.from_bytes(
        bytes(d["data"]),
        point_step=d["point_step"],
        x_offset=fields["x"]["offset"],
        y_offset=fields["y"]["offset"],
        z_offset=fields["z"]["offset"],
        dtype_code=fields["x"]["datatype"],
        row_step=d["row_step"],
        height=d["height"],
    )
    assert cloud.points.shape == (d["width"] * d["height"], 3)
    assert np.isfinite(cloud.points).all()
    # the recording is a real indoor frame: points must span meters, not
    # garbage from a misaligned stride
    spread = cloud.points[:, :2].max(axis=0) - cloud.points[:, :2].min(axis=0)
    assert (spread > 1.0).all() and (spread < 1000.0).all()

    cfg = MapConfig(width=10.0, height=10.0, resolution=0.1)
    mapper = LocalMapper(
        config=cfg,
        scan_model_config=ScanModelConfig(
            angle_step=np.deg2rad(1.0), max_height=2.0, min_height=-0.2
        ),
    )
    mapper.update_from_scan(PoseData(), cloud)
    n_occ, n_empty, n_unknown = _occupancy_counts(mapper.occupancy)
    assert n_occ + n_empty + n_unknown == mapper.occupancy.size
    assert n_occ > 0, "livox cloud should stamp OCCUPIED cells"
    assert n_empty > 0, "rays should sweep EMPTY cells"


def test_emergency_stop_recorded_scan_geometry(recorded_scan):
    """Reference test_laserscan_emergency_stop.py:139-179 with the
    recorded scan's angular geometry."""
    from kompass_core_tpu.utils.emergency_stop import EmergencyChecker

    robot_radius = 0.1
    robot = Robot(
        robot_type=RobotType.ACKERMANN,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([robot_radius, 0.4]),
    )
    emergency_distance = 0.5
    checker = EmergencyChecker(
        robot=robot,
        emergency_distance=emergency_distance,
        slowdown_distance=1.0,
        emergency_angle=90.0,
        sensor_position_robot=np.array([0.0, 0.0, 0.173], np.float32),
        sensor_rotation_robot=np.array([1.0, 0.0, 0.0, 0.0], np.float32),
    )
    large_range = 10.0
    emergency_value = robot_radius + emergency_distance / 2

    recorded_scan.ranges = np.full(recorded_scan.angles.size, large_range)
    assert checker.run(scan=recorded_scan, forward=True) == 1.0

    recorded_scan.ranges[0] = emergency_value
    assert checker.run(scan=recorded_scan, forward=True) == 0.0
    assert checker.run(scan=recorded_scan, forward=False) == 1.0


# --- turtlebot map planning (reference test_ompl.py) ----------------------


def _reference_planner_ids():
    """All planner ids the reference exercises on this map
    (tests/resources/reference/ompl/test_results_geometric_ref.csv, the
    recorded output of the reference's own test_ompl.py run)."""
    import csv

    path = os.path.join(RES, "ompl", "test_results_geometric_ref.csv")
    with open(path) as f:
        return [row["method"].rsplit(".", 1)[-1] for row in csv.DictReader(f)]


@pytest.mark.parametrize("planner_id", _reference_planner_ids())
def test_planner_solves_turtlebot_map(planner_id):
    from kompass_core_tpu.planning import GlobalPlanner, GlobalPlannerConfig

    with open(os.path.join(RES, "ompl", "map_meta.json")) as f:
        map_meta = json.load(f)
    map_cloud = np.load(os.path.join(RES, "ompl", "turtlebot_map.npy"))

    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.1, 0.4]),
    )
    cfg = GlobalPlannerConfig(
        planner_id=planner_id,
        num_samples=512,
        seed=2,
        connection_radius=1.5,
        # EST has no Voronoi pull toward unexplored space — give it the
        # expansion budget instead of burning timeout-driven seed retries
        max_iterations=3072 if planner_id == "EST" else 1024,
        step_size=0.3,
        # passing runs take ~1.5 s/planner; a bounded timeout keeps the
        # regression worst case (full seed-retry budget per broken
        # planner before the assertion fires) in check
        planning_timeout=10.0,
    )
    planner = GlobalPlanner(robot, config=cfg)
    # start/goal from the turtlebot3 world example (test_ompl.py:52-59)
    planner.setup_problem(
        map_meta, -1.88, -0.38, 0.3, 0.59, 0.73, 0.0, map_cloud
    )
    path = planner.solve()
    assert path is not None, f"{planner_id} failed on the turtlebot map"
    np.testing.assert_allclose(path[0], [-1.88, -0.38], atol=0.4)
    np.testing.assert_allclose(path[-1], [0.59, 0.73], atol=0.4)
    straight = float(np.hypot(0.59 + 1.88, 0.73 + 0.38))
    # reference planners solve this map at 2.9-4.5 m
    # (test_results_geometric_ref.csv solution_len column)
    assert straight <= planner.path_cost < 6.5
    # solution must avoid the inflated map
    for a, b in zip(path[:-1], path[1:]):
        assert planner._segment_free_host(a, b)
