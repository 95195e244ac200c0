"""Front-end API-surface parity + PCD reader + spline path tools.

The export lists below are transcribed from the reference's package
``__init__`` files (``kompass_core/datatypes/__init__.py:19-41``,
``control/__init__.py:98-118``, ``algorithms/__init__.py``,
``py_path_tools/__init__.py``) — a reference user's imports must resolve
here. PCD semantics mirror ``kompass_cpp/include/utils/pointcloud.h`` and
the spline path tools mirror ``py_path_tools/interpolation.py``.
"""

import importlib
import math
import struct

import numpy as np
import pytest

REFERENCE_EXPORTS = {
    "datatypes": [
        "LaserScanData",
        "ObstaclesData",
        "PathPoint",
        "PathSample",
        "TrajectorySample",
        "MotionSample",
        "Point2D",
        "InterpolationPoint",
        "PathTrackingError",
        "TrackedPoint",
        "Range2D",
        "Odom2D",
        "PointCloudData",
        "ScanModelConfig",
        "PoseData",
        "Bbox3D",
        "Bbox2D",
        "PointsOfInterest",
        "get_points_from_pcd",
        "get_occupancy_grid_from_pcd",
    ],
    "control": [
        "StrEnum",
        "ControllerType",
        "DVZ",
        "DVZConfig",
        "ControllersID",
        "ControlClasses",
        "ControlConfigClasses",
        "Stanley",
        "StanleyConfig",
        "PurePursuit",
        "PurePursuitConfig",
        "FollowingStatus",
        "DWA",
        "DWAConfig",
        "TrajectoryCostsWeights",
        "VisionRGBFollower",
        "VisionRGBFollowerConfig",
        "VisionRGBDFollower",
        "VisionRGBDFollowerConfig",
        "FollowerTemplate",
    ],
    "models": [
        "MotionModel2DParams",
        "MotionModel2D",
        "RobotState",
        "CircularFootprint",
        "RectangleFootprint",
        "footprint_types",
        "RobotGeometry",
        "MotionControl",
        "DifferentialDriveControl",
        "AckermannControl",
        "OmniDirectionalControl",
        "RobotType",
        "LinearCtrlLimits",
        "AngularCtrlLimits",
        "RobotCtrlLimits",
        "Robot",
    ],
    "algorithms": ["DeformableVirtualZone", "DeformableVirtualZoneParams"],
    "py_path_tools": ["PathExecutor", "SplineInterpolatedPath"],
    "mapping": ["LocalMapper", "MapConfig"],
    "": ["set_logging_level"],
}


@pytest.mark.parametrize("module,symbols", sorted(REFERENCE_EXPORTS.items()))
def test_reference_exports_resolve(module, symbols):
    name = "kompass_core_tpu" + ("." + module if module else "")
    mod = importlib.import_module(name)
    missing = [s for s in symbols if not hasattr(mod, s)]
    assert not missing, f"{name} missing reference exports: {missing}"


def test_control_registry_accepts_enum_and_string():
    from kompass_core_tpu.control import (
        ControlClasses,
        ControlConfigClasses,
        ControllersID,
        DWA,
        DWAConfig,
    )

    assert ControlClasses[ControllersID.DWA] is DWA
    assert ControlClasses["DWA"] is DWA  # str-mixin hash equality
    assert ControlConfigClasses[ControllersID.DWA] is DWAConfig
    assert ControllersID.get_enum("Stanley") is ControllersID.STANLEY
    assert ControllersID.get_enum("nope") is None
    assert "DWA" in ControllersID.values()
    assert str(ControllersID.DWA) == "DWA"
    assert len(ControlClasses) == 6


# ---------------------------------------------------------------- PCD


def _write_ascii_pcd(path, points, fields="x y z"):
    n = len(points)
    sizes = " ".join(["4"] * len(fields.split()))
    with open(path, "w") as f:
        f.write(
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\n"
            f"FIELDS {fields}\n"
            f"SIZE {sizes}\n"
            f"TYPE {' '.join(['F'] * len(fields.split()))}\n"
            f"COUNT {' '.join(['1'] * len(fields.split()))}\n"
            f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA ascii\n"
        )
        for p in points:
            f.write(" ".join(f"{v:.6f}" for v in p) + "\n")


def _write_binary_pcd(path, points_xyz, extra_field=False):
    """Binary PCD; optionally with an extra leading 'intensity' field so
    the x/y/z byte offsets are non-trivial."""
    fields = ("intensity x y z" if extra_field else "x y z").split()
    n = len(points_xyz)
    with open(path, "wb") as f:
        hdr = (
            "VERSION 0.7\n"
            f"FIELDS {' '.join(fields)}\n"
            f"SIZE {' '.join(['4'] * len(fields))}\n"
            f"TYPE {' '.join(['F'] * len(fields))}\n"
            f"COUNT {' '.join(['1'] * len(fields))}\n"
            f"WIDTH {n}\nHEIGHT 1\nPOINTS {n}\nDATA binary\n"
        )
        f.write(hdr.encode())
        for i, (x, y, z) in enumerate(points_xyz):
            rec = struct.pack("<fff", x, y, z)
            if extra_field:
                rec = struct.pack("<f", float(i)) + rec
            f.write(rec)


def test_read_pcd_ascii(tmp_path):
    from kompass_core_tpu.datatypes import get_points_from_pcd

    pts = [(0.5, -1.25, 0.125), (3.0, 2.0, 1.5), (-0.5, 0.0, 2.25)]
    file = tmp_path / "cloud.pcd"
    _write_ascii_pcd(file, pts)
    out = get_points_from_pcd(str(file))
    assert out.shape == (3, 3) and out.dtype == np.float32
    np.testing.assert_allclose(out, np.array(pts, dtype=np.float32))


def test_read_pcd_binary_with_offsets(tmp_path):
    from kompass_core_tpu.datatypes import get_points_from_pcd

    pts = [(1.0, 2.0, 3.0), (-4.5, 0.25, 9.0)]
    file = tmp_path / "cloud_bin.pcd"
    _write_binary_pcd(file, pts, extra_field=True)
    out = get_points_from_pcd(str(file))
    np.testing.assert_array_equal(out, np.array(pts, dtype=np.float32))


def test_read_pcd_failures(tmp_path):
    from kompass_core_tpu.datatypes import get_points_from_pcd
    from kompass_core_tpu.datatypes.pcd import read_pcd

    # missing file -> None / RuntimeError (reference bindings_utils.cpp:19)
    assert read_pcd(str(tmp_path / "nope.pcd")) is None
    with pytest.raises(RuntimeError):
        get_points_from_pcd(str(tmp_path / "nope.pcd"))
    # missing z field
    bad = tmp_path / "bad.pcd"
    _write_ascii_pcd(bad, [(1.0, 2.0)], fields="x y")
    assert read_pcd(str(bad)) is None
    # unsupported DATA format
    comp = tmp_path / "comp.pcd"
    comp.write_text(
        "FIELDS x y z\nSIZE 4 4 4\nPOINTS 1\nDATA binary_compressed\n"
    )
    assert read_pcd(str(comp)) is None
    # truncated binary payload
    trunc = tmp_path / "trunc.pcd"
    _write_binary_pcd(trunc, [(1.0, 2.0, 3.0)])
    data = trunc.read_bytes()
    trunc.write_bytes(data[:-4])
    assert read_pcd(str(trunc)) is None


def test_pcd_to_occupancy_grid(tmp_path):
    from kompass_core_tpu.datatypes import get_occupancy_grid_from_pcd

    # 2x2 m footprint, 1 m cells: ground point, obstacle point, overhead
    # point, and an obstacle+ground pair sharing a cell (occupied wins)
    pts = [
        (0.1, 0.1, 0.0),  # ground -> EMPTY
        (1.5, 0.5, 0.5),  # obstacle -> OCCUPIED
        (0.5, 1.5, 5.0),  # overhead -> UNEXPLORED
        (1.5, 1.5, 0.0),  # ground...
        (1.6, 1.6, 0.7),  # ...plus obstacle in same cell -> OCCUPIED
        (2.0, 2.0, 0.0),  # bbox max corner (sets grid extent; dropped by
        # the exclusive upper-bound cell check, as in the reference)
    ]
    file = tmp_path / "grid.pcd"
    _write_ascii_pcd(file, pts)
    grid, origin = get_occupancy_grid_from_pcd(
        str(file), grid_resolution=1.0, z_ground_limit=0.1, robot_height=2.0
    )
    assert grid.shape == (2, 2) and grid.dtype == np.int8
    np.testing.assert_allclose(origin, [0.1, 0.1, 0.0], atol=1e-6)
    assert grid[0, 0] == 0  # EMPTY
    assert grid[1, 0] == 100  # OCCUPIED
    assert grid[0, 1] == -1  # UNEXPLORED
    assert grid[1, 1] == 100  # max-combine: occupied beats ground


def test_pcd_to_occupancy_grid_empty(tmp_path):
    from kompass_core_tpu.datatypes import get_occupancy_grid_from_pcd

    file = tmp_path / "empty.pcd"
    _write_ascii_pcd(file, [])
    grid, origin = get_occupancy_grid_from_pcd(str(file), 0.5, 0.1, 2.0)
    assert grid.size == 0
    np.testing.assert_array_equal(origin, [0.0, 0.0, 0.0])


# ------------------------------------------------- SplineInterpolatedPath


def _circle_path(radius=10.0, n=200, arc=math.pi / 2):
    from kompass_core_tpu.datatypes import InterpolationPoint

    thetas = np.linspace(0.0, arc, n)
    return [
        InterpolationPoint(
            s=radius * t,
            x=radius * math.sin(t),
            y=radius * (1.0 - math.cos(t)),
            pitch=t,
        )
        for t in thetas
    ]


def test_spline_interpolated_path_basics():
    from kompass_core_tpu.py_path_tools import SplineInterpolatedPath

    pts = _circle_path()
    path = SplineInterpolatedPath(seg_len_init=0.05, seg_len_max=20.0)
    path.set_path_points_yaw(pts, "map")
    assert path.frame_id == "map"
    assert path.length == pytest.approx(10.0 * math.pi / 2)
    x, y = path(5.0)
    assert x == pytest.approx(10 * math.sin(0.5), abs=1e-3)
    assert y == pytest.approx(10 * (1 - math.cos(0.5)), abs=1e-3)
    _, _, yaw = path.get_interpolated_pose(5.0)
    assert yaw == pytest.approx(0.5, abs=1e-3)
    # end detection
    assert path.reached_end(pts[-1].x, pts[-1].y)
    assert not path.reached_end(0.0, 0.0)
    # segment restriction
    sub = path.get_path_segment(5.0)
    assert sub.length < 5.0
    assert sub.spline_x.get_points_len() < path.spline_x.get_points_len()


def test_spline_closest_point_tracking_errors():
    from kompass_core_tpu.py_path_tools import SplineInterpolatedPath

    pts = _circle_path(radius=20.0, arc=1.2)
    path = SplineInterpolatedPath(seg_len_init=0.05, seg_len_max=30.0)
    path.set_path_points(pts, "map")

    # robot slightly LEFT of the arc (inside the circle), heading along it
    s_query = 8.0
    t = s_query / 20.0
    px, py = 20 * math.sin(t), 20 * (1 - math.cos(t))
    nx, ny = -math.sin(t), math.cos(t)  # left normal of tangent
    tp = path.get_closest_path_point(
        px + 0.2 * nx, py + 0.2 * ny, yaw=t, speed=1.0
    )
    assert tp is not None
    assert tp.s == pytest.approx(s_query, abs=0.2)
    # reference sign convention: gamma = tangent - bearing; a point on the
    # LEFT of the path yields negative lat_dist
    assert tp.lat_dist == pytest.approx(-0.2, abs=0.02)
    assert tp.curv == pytest.approx(1.0 / 20.0, abs=5e-3)
    assert abs(tp.ori_err) < 0.05
    assert tp.s_dot == pytest.approx(1.0, abs=0.05)

    # reverse speed flips the frame: orientation error measured against
    # the reversed tangent
    tp_rev = path.get_closest_path_point(
        px, py, yaw=math.pi + t, speed=-1.0
    )
    assert tp_rev is not None
    assert abs(tp_rev.ori_err) < 0.05


def test_spline_limit_check_and_unset():
    from kompass_core_tpu.py_path_tools import Spline

    sp = Spline()
    with pytest.raises(ValueError):
        sp(0.5)
    assert not sp.limit_check(0.5)
    sp.set_points(np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 4.0]))
    assert sp.limit_check(0.5)
    assert not sp.limit_check(2.5)
    assert sp(1.0) == pytest.approx(1.0)
    assert sp.get_points_len() == 3


# ----------------------------------------------------------- models.py


def test_motion_model_reference_surface(tmp_path):
    from kompass_core_tpu.models import (
        MotionModel2D,
        MotionModel2DParams,
    )

    params = MotionModel2DParams(x_dot_prop_vx=0.9, yaw_dot_prop=0.8)
    model = MotionModel2D(params)
    assert model.x_dot_prop_vx == 0.9
    assert model.yaw_dot_prop == 0.8  # reference field name alias
    assert model.params.yaw_dot_prop == 0.8

    # classmethod models (reference models.py:60-129); heading wraps 0..2pi
    x_new = MotionModel2D.x_model((1.0, 0.0, 2.0, 0.0, 0.1), 1.0, 0.0)
    assert x_new == pytest.approx(1.2)
    y_new = MotionModel2D.y_model((0.0, math.pi / 2, 2.0, 0.0, 0.1), 1.0, 0.0)
    assert y_new == pytest.approx(0.2)
    yaw_new = MotionModel2D.heading_model((-0.1, 0.0, 0.1), 1.0)
    assert yaw_new == pytest.approx(2 * math.pi - 0.1)

    model.set_linear_x_params([1.1, 0.2])
    model.set_angular_params([0.7])
    assert model.x_dot_prop_vy == 0.2 and model.yaw_dot_prop_omega == 0.7
    assert "Kinematic Model" in str(model)

    cfg = tmp_path / "robot.yaml"
    cfg.write_text(
        "robot:\n  x_dot_prop_vx: 0.5\n  yaw_dot_prop: 0.6\n"
    )
    model.set_params_from_file(str(cfg))
    assert model.x_dot_prop_vx == 0.5 and model.yaw_dot_prop == 0.6


def test_robot_state_reference_surface(tmp_path):
    from kompass_core_tpu.models import RobotState

    a = RobotState(x=3.0, y=4.0, yaw=0.5, speed=1.0)
    b = RobotState(x=0.0, y=0.0)
    assert abs(a) == pytest.approx(5.0)
    assert a.distance(b) == pytest.approx(5.0)
    with pytest.raises(TypeError):
        a.distance((0.0, 0.0))

    front = RobotState(x=1.0, y=1.0, yaw=math.pi / 2).front_state_from_center_state(
        robot_radius=0.4
    )
    assert front.x == pytest.approx(1.0)
    assert front.y == pytest.approx(1.2)

    cfg = tmp_path / "state.yaml"
    cfg.write_text(
        "robot:\n  robot_initial_x: 2.0\n  robot_initial_heading: 0.3\n"
    )
    s = RobotState()
    s.set_from_yaml(str(cfg))
    assert s.x == 2.0 and s.yaw == 0.3


def test_robot_geometry_and_controls_reference_surface():
    import numpy as np

    from kompass_core_tpu.models import (
        AckermannControl,
        CircularFootprint,
        DifferentialDriveControl,
        OmniDirectionalControl,
        RectangleFootprint,
        Robot,
        RobotGeometry,
        RobotType,
    )

    assert RobotType.to_str(RobotType.OMNI) == "OMNI"
    assert RobotType.to_str("ACKERMANN") == "ACKERMANN"
    with pytest.raises(ValueError):
        RobotType.to_str("HOVERCRAFT")

    cyl = np.array([0.3, 1.0])
    box = np.array([0.6, 0.4, 0.2])
    assert RobotGeometry.get_length(RobotGeometry.Type.BOX, box) == 0.6
    assert (
        RobotGeometry.get_length(RobotGeometry.Type.BOX, np.array([0.6]))
        is None
    )
    fp = RobotGeometry.get_footprint(RobotGeometry.Type.CYLINDER, cyl)
    assert isinstance(fp, CircularFootprint) and fp.get_radius() == 0.3
    fp2 = RobotGeometry.get_footprint(RobotGeometry.Type.BOX, box)
    assert isinstance(fp2, RectangleFootprint)
    assert fp2.length == pytest.approx(0.6) and fp2.width == pytest.approx(0.4)

    # kinematic control conversions (reference models.py:995-1135)
    diff = DifferentialDriveControl.init_zero(wheel_base=0.5)
    diff.update_ctr(omega=2.0, velocity_x=1.0)
    assert diff.v_right == pytest.approx(1.5)
    assert diff.v_left == pytest.approx(0.5)
    assert diff.linear_velocity_x == 1.0 and diff.angular_velocity == 2.0
    diff.angular_velocity = 0.0
    assert diff.v_left == diff.v_right == 1.0

    ack = AckermannControl.init_zero(wheel_base=0.4)
    ack.update_ctr(omega=0.5, velocity_x=1.0)
    assert ack.linear_vel == 1.0

    omni = OmniDirectionalControl.init_zero(wheel_base=0.4)
    omni.update_ctr(omega=0.0, velocity_x=0.5, velocity_y=0.2)
    assert omni.linear_velocity_y == 0.2

    # Robot aggregate carries a per-type control holder + geometry props
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=cyl,
    )
    assert isinstance(robot.control, DifferentialDriveControl)
    assert robot.height == pytest.approx(1.0)
    assert isinstance(robot.footprint, CircularFootprint)
    robot.set_state(1.0, 2.0, 0.5, 0.1)
    assert robot.state.x == 1.0 and robot.state.speed == 0.1
    from kompass_core_tpu.models import MotionModel2D

    new_model = MotionModel2D(x_dot_prop_vx=0.8)
    robot.set_model(new_model)
    assert robot.state.model.x_dot_prop_vx == 0.8


def test_follower_template_surface_complete():
    """Every wrapper controller exposes the reference FollowerTemplate
    surface (``control/_base_.py:209-392``)."""
    from kompass_core_tpu.control import DVZ, DWA, PurePursuit, Stanley

    surface = [
        "loop_step",
        "logging_info",
        "linear_x_control",
        "linear_y_control",
        "angular_control",
        "reached_end",
        "set_path",
        "path",
        "optimal_path",
        "interpolated_path",
        "set_interpolation_type",
        "tracked_state",
        "distance_error",
        "orientation_error",
        "planner",
    ]
    for cls in (DWA, Stanley, PurePursuit, DVZ):
        missing = [m for m in surface if not hasattr(cls, m)]
        assert not missing, f"{cls.__name__} missing {missing}"


# ------------------------------------------------------- PathExecutor


def test_path_executor_record_save_load(tmp_path):
    from kompass_core_tpu.py_path_tools import PathExecutor, PathExecutorParams

    ex = PathExecutor(PathExecutorParams(min_segment_length=0.05))
    ex.start_path_recording()
    n_rec = 0
    for x in np.linspace(0.0, 2.0, 100):
        n_rec += ex.record_path_point(float(x), 0.0, 0.0, vel=0.5)
    assert 30 < n_rec < 60  # pruned by min_segment_length
    assert ex.total_length == pytest.approx(2.0, abs=0.1)

    assert ex.save_path_to_xml(str(tmp_path), "ref", frame_id="odom")
    ex2 = PathExecutor()
    assert ex2.read_path_from_xml(str(tmp_path), "ref")
    assert len(ex2.ref_path) == n_rec
    assert ex2.params.frame_id == "odom"
    assert ex2.total_length == pytest.approx(ex.total_length)
    assert ex2.ref_path[3].speed == 0.5
    assert not ex2.read_path_from_xml(str(tmp_path), "missing")


def test_path_executor_closest_point_and_heading():
    from kompass_core_tpu.datatypes import PathPoint
    from kompass_core_tpu.py_path_tools import PathExecutor

    path = [PathPoint(idx=i, x=float(i), y=0.0) for i in range(5)]
    assert PathExecutor.get_closest_point_index(path, 2.2, 0.5) == 2
    # index 0 is a valid answer (reference's falsy-int check loses it)
    assert PathExecutor.get_closest_point(path, -1.0, 0.0) is path[0]
    assert PathExecutor.get_closest_point([], 0.0, 0.0) is None
    assert PathExecutor.get_path_heading(path, 1) == pytest.approx(0.0)
    # last-index heading comes from the previous segment (the reference's
    # own last-index branch is dead and raises)
    assert PathExecutor.get_path_heading(path, 4) == pytest.approx(0.0)
    with pytest.raises(IndexError):
        PathExecutor.get_path_heading(path, 7)


def test_path_executor_interpolation_and_reached_end():
    from kompass_core_tpu.py_path_tools import PathExecutor, PathExecutorParams

    ex = PathExecutor(
        PathExecutorParams(
            min_segment_length=0.05,
            spline_segment_length=0.1,
            min_interpolation_dist=2.0,
            max_end_dist_error=0.3,
            max_end_ori_error=1.0,
        )
    )
    ex.start_path_recording()
    for t in np.linspace(0.0, math.pi / 2, 80):
        ex.record_path_point(
            5.0 * math.sin(t), 5.0 * (1 - math.cos(t)), t, vel=0.5
        )
    assert ex.interpolate_path_spline(0.0, 0.0)
    assert len(ex.interpolation_xpoints) > 3
    # interpolated segment stays near the recorded arc
    for px, py in zip(ex.interpolation_xpoints, ex.interpolation_ypoints):
        r = math.hypot(px, py - 5.0)
        assert abs(r - 5.0) < 0.2

    end = ex.ref_path[-1]
    reached, lat, ori = ex.reached_end(end.x, end.y, end.heading)
    assert reached and lat == pytest.approx(0.0)
    reached, lat, _ = ex.reached_end(0.0, 0.0, 0.0)
    assert not reached and lat > 1.0


def test_path_executor_motion_recording(tmp_path):
    from kompass_core_tpu.py_path_tools import PathExecutor

    ex = PathExecutor()
    assert not ex.record_trajectory_point(0, 0, 0, 0.0)  # not started
    assert not ex.record_motion_point(0, 0, 0, 0.0, 0.1, 0.0, 0.2)

    ex.start_trajectory_recording(recording_period=1.0, recording_step=0.1)
    for k in range(20):
        ok = ex.record_trajectory_point(0.1 * k, 0.0, 0.0, 0.1 * k)
        assert ok == (k < 9)  # capacity period/step - 1

    ex.start_motion_recording(recording_period=1.0, recording_step=0.1)
    assert ex.record_motion_point(0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.1)
    assert ex.rec_motion.vx_points[0] == 0.5
    assert ex.save_motion_to_csv(str(tmp_path), "motion")
    csv_text = (tmp_path / "motion.csv").read_text()
    assert csv_text.startswith("time,x,y,heading,speed")
    assert "0.5" in csv_text


# ------------------------------------- offline tools reference surface


def test_motion_cost_incremental_api():
    from kompass_core_tpu.datatypes import ObstaclesData, OBSTACLE_TYPE, PathPoint
    from kompass_core_tpu.datatypes.path_sample import PathSample
    from kompass_core_tpu.models import CircularFootprint
    from kompass_core_tpu.motion_cost import (
        DynamicCollisionProbabilityCost,
        MotionCostsParams,
        ReferenceCost,
        StaticCollisionCost,
    )

    path = PathSample(3)
    path.set_path([0.0, 1.0, 2.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0])

    obs = ObstaclesData()
    obs.add_obstacle(OBSTACLE_TYPE.SCAN, 1.0, 0.2)

    # footprint-based ctor (reference contract) + incremental update
    static = StaticCollisionCost(2.0, 0.1, CircularFootprint(rad=0.3))
    assert static._get_collision_limit_radius() == pytest.approx(0.4)
    w = static.update(path, 1, obs)  # obstacle 0.2m from (1,0): collides
    assert static.value == 1.0 and w == 2.0
    w = static.update(path, 0, obs)  # (0,0) is 1m away: no collision
    assert static.value == 1.0 and w == 2.0 and static.call() == 2.0

    dyn = DynamicCollisionProbabilityCost(1.0, 0.1, 0.3)
    maps = [obs, obs, obs]
    w = dyn.update(path, 1, maps, time_step=0.1, prediction_horizon=1.0)
    assert 0.0 < dyn.value <= 1.0  # overlapping inflated circles
    w0 = dyn.update(path, 0, maps, time_step=0.1, prediction_horizon=1.0)
    assert w0 >= w * 0 and dyn.value > 0  # max-tracked across indices

    ref_pts = [PathPoint(idx=i, x=float(i), y=0.0) for i in range(4)]
    ref = ReferenceCost(1.0, 0.5)
    path_off = PathSample(2)
    path_off.set_path([0.0, 1.0], [0.3, 0.3], [0.1, 0.1])
    d_w, h_w = ref.update(path_off, 0, ref_pts)
    assert d_w == pytest.approx(0.15)  # 0.3/2 * weight 1.0
    assert h_w == pytest.approx(0.5 * 0.05)  # |0.1|/2 * weight 0.5

    params = MotionCostsParams()
    params.set(0.2, 5.0, 0.3, 1.0, 1.0, 0.1)
    assert params.static_collision_margin == 0.2
    assert params.static_collision_weight == 5.0


def test_circle_overlap_probability():
    from kompass_core_tpu.utils.geometry import probability_of_collision_circles

    # far apart -> 0; identical -> 1; contained -> 1 (reference raises)
    assert probability_of_collision_circles(0, 0, 5, 0, 1.0, 1.0) == 0.0
    assert probability_of_collision_circles(0, 0, 0, 0, 1.0, 1.0) == 1.0
    assert probability_of_collision_circles(0, 0, 0.1, 0, 0.5, 2.0) == 1.0
    p = probability_of_collision_circles(0, 0, 1.0, 0, 1.0, 1.0)
    assert 0.0 < p < 1.0


def test_dvz_gradients_and_zone_plot():
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from kompass_core_tpu.algorithms import DeformableVirtualZone
    from kompass_core_tpu.algorithms.dvz import DeformableVirtualZoneParams
    from kompass_core_tpu.models import (
        AngularCtrlLimits,
        LinearCtrlLimits,
        Robot,
        RobotCtrlLimits,
        RobotGeometry,
        RobotState,
        RobotType,
    )

    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.4]),
    )
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=2.0, max_decel=2.0),
        omega_limits=AngularCtrlLimits(
            max_vel=2.0, max_acc=4.0, max_decel=4.0, max_steer=3.1
        ),
    )
    dvz = DeformableVirtualZone(
        robot=robot, ctrl_limits=limits, config=DeformableVirtualZoneParams()
    )
    dvz.update_zone_size(robot_speed=0.5)
    assert dvz.zone_major_radius_diff == pytest.approx(1.0)
    assert dvz.zone_shift_x_diff == pytest.approx(-2.0 / 3.0)

    dvz.get_gradients(0.5)
    for name in ("grad_A_u", "grad_A_ang", "grad_B_u", "grad_B_ang", "grad_C_u"):
        assert isinstance(getattr(dvz, name), float) or np.isfinite(
            getattr(dvz, name)
        )
    # A-term angular gradient formula: 2 sin cos (b^2 - a^2)
    expected = (
        2
        * np.cos(0.5)
        * np.sin(0.5)
        * (dvz.zone_minor_radius**2 - dvz.zone_major_radius**2)
    )
    assert dvz.grad_A_ang == pytest.approx(expected)

    angles = np.linspace(-np.pi, np.pi, 60)
    dvz.set_scan_values(np.full(60, 0.4), angles)
    dvz.get_total_deformation(compute_deformation_plot=True)
    fig_ax = None
    dvz.plt_robot_zone(RobotState(x=0.0, y=0.0, yaw=0.1), display_now=False)


def test_offline_tool_surface(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from kompass_core_tpu.datatypes import PathPoint
    from kompass_core_tpu.performance import MotionResult, TestBase
    from kompass_core_tpu.calibration import Calibration
    from kompass_core_tpu.simulation import MotionPaths, RobotSim

    cfg = tmp_path / "robot.yaml"
    cfg.write_text(
        "robot:\n"
        "  robot_model_type: DIFFERENTIAL_DRIVE\n"
        "  robot_geometry_type: CYLINDER\n"
        "  robot_geometry_params: [0.25, 0.4]\n"
        "  robot_initial_x: 1.5\n"
    )
    sim = RobotSim()
    sim.init_robot(str(cfg))
    assert sim.robot.radius == pytest.approx(0.25)
    assert sim.robot.state.x == 1.5

    tb = TestBase(str(cfg))
    assert tb.result is not None and tb.test == []
    tb.result.reached_end = True
    tb.reset()
    assert not tb.result.reached_end

    # vis_result renders a figure from a result
    res = MotionResult()
    res.reference_path = MotionPaths.generate_line_path(num_points=20)
    res.executed_path = MotionPaths.generate_line_path(num_points=25)
    fig = res.vis_result(robot_footprint=sim.robot.footprint)
    assert fig is not None

    # calibration visualization renders
    model_data = sim.simulate_motion(
        np.full(30, 0.5), np.full(30, 0.1), time_step=0.1
    )
    fig2 = Calibration.vis_calibration(model_data, model_data)
    assert fig2 is not None


def test_motion_evaluation_compute_motion_cost():
    from kompass_core_tpu.datatypes import PathPoint
    from kompass_core_tpu.performance import MotionEvaluation, MotionResult
    from kompass_core_tpu.simulation import MotionPaths

    ev = MotionEvaluation()
    res = MotionResult()
    res.executed_path = MotionPaths.generate_line_path(num_points=10)
    ref_pts = [PathPoint(idx=i, x=i * 0.5, y=0.1) for i in range(12)]
    total = ev.compute_motion_cost(res, ref_pts)
    assert total > 0.0  # constant 0.1 lateral offset accumulates
    assert ev.end_goal_cost.displacement.value > 0.0


def test_sample_classes_reference_surface(tmp_path):
    import numpy as np

    from kompass_core_tpu.datatypes import (
        MotionSample,
        PathSample,
        PoseData,
        TrajectorySample,
    )

    # PathSample block setter with bounds guard
    p = PathSample(5)
    p.set_points([1.0, 2.0], [3.0, 4.0], [0.1, 0.2], idx_start=3)
    assert p.x_points[4] == 2.0 and p.heading_points[3] == 0.1
    p.set_points([9.0] * 4, [9.0] * 4, [0.0] * 4, idx_start=3)  # too long
    assert p.x_points[4] == 2.0  # rejected, unchanged

    # TrajectorySample: set_traj / from_path / block points / re-length
    t = TrajectorySample(3)
    t.set_traj([1, 2, 3], [0, 0, 0], [0, 0, 0], [0.0, 0.1, 0.2])
    assert t.time[2] == pytest.approx(0.2)
    assert t.path_sample is t  # SoA self-view
    t2 = TrajectorySample(1)
    t2.set_traj_from_path(p, np.arange(5.0))
    assert len(t2.time) == 5 and t2.x_points[4] == 2.0
    t2.set_traj_length(2)
    assert len(t2.time) == 2
    t.set_traj_points([7.0], [8.0], [0.5], [9.9], idx_start=1)
    assert t.x_points[1] == 7.0 and t.time[1] == pytest.approx(9.9)

    # MotionSample: control matrix + block/bulk setters + csv round trip
    m = MotionSample(4)
    m.set_control(
        np.array([1.0, 2, 3, 4]), np.zeros(4), np.array([0.1, 0.2, 0.3, 0.4])
    )
    assert m.control.shape == (4, 3)
    assert m.control[2, 0] == 3.0 and m.control[3, 2] == pytest.approx(0.4)
    m.set_motion_point(1.0, 2.0, 0.3, 0.5, 9.0, 0.0, 1.5, idx=2)
    assert m.x_points[2] == 1.0 and m.vx_points[2] == 9.0
    m.set_motion_points(
        [5.0], [6.0], [0.0], [1.0], [7.0], [0.0], [2.0], idx_start=0
    )
    assert m.x_points[0] == 5.0 and m.omega_points[0] == 2.0
    assert m.save_to_csv(str(tmp_path), "m")
    m2 = MotionSample(1)
    assert m2.get_from_csv(str(tmp_path), "m")
    np.testing.assert_allclose(m2.vx_points, m.vx_points)
    np.testing.assert_allclose(m2.x_points, m.x_points)
    m.set_length(2)
    assert len(m.time) == 2 and m.control.shape == (2, 3)

    # PoseData orientation surface
    pose = PoseData()
    pose.set_pose(1.0, 2.0, 0.0, 0.92, 0.0, 0.0, 0.38)
    np.testing.assert_allclose(
        pose.get_orientation(), [0.92, 0.0, 0.0, 0.38]
    )
    other = PoseData()
    other.set_pose(1.005, 2.0, 0.0, -0.92, 0.0, 0.0, -0.38)  # sign-flipped
    assert pose.check_approximate_equivalence(other, absolute_tolerance=0.01)
    other.set_position(1.5, 2.0, 0.0)
    assert not pose.check_approximate_equivalence(other)


def test_visualization_reference_surface(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from kompass_core_tpu.datatypes import OBSTACLE_TYPE, ObstaclesData
    from kompass_core_tpu.datatypes.path_sample import PathPoint, PathSample
    from kompass_core_tpu.utils import visualization as V

    grid = np.full((10, 10), 0, np.int8)
    grid[2:4, 2:4] = 100
    grid[0, 0] = -1
    img = V.visualize_grid(
        grid, scale=2.0, save_file=str(tmp_path / "g.png")
    )
    assert img.shape == (20, 20, 3)
    assert (tmp_path / "g.png").exists()
    np.testing.assert_array_equal(img[0, 0], [51, 51, 51])  # unexplored
    np.testing.assert_array_equal(img[4, 4], [0, 0, 0])  # occupied
    assert V.get_color("red") == [255.0, 0.0, 0.0]
    assert V.get_color("grey", normalized=True) == [0.5, 0.5, 0.5]

    p = PathSample(3)
    p.set_path([0, 1, 2], [0, 0, 0], [0, 0, 0])
    V.plt_path_sample(p, color="not-a-color", marker="not-a-marker")
    V.plt_path_points_list([PathPoint(0, 0.0, 0.0), PathPoint(1, 1.0, 1.0)])
    obs = ObstaclesData()
    obs.add_obstacle(OBSTACLE_TYPE.SCAN, 1.0, 0.5)
    V.plt_map_obstacles(obs)


def test_laserscan_polar_tf_recorded_scan():
    """90-degree polar scan transform on the recorded scan fixture
    (mirrors reference ``test_laserscan_emergency_stop.py:40-96``)."""
    import json
    import os

    from kompass_core_tpu.datatypes import LaserScanData
    from kompass_core_tpu.utils.geometry import (
        get_laserscan_transformed_polar_coordinates,
    )

    res = os.path.join(
        os.path.dirname(__file__),
        "resources",
        "reference",
        "mapping",
        "laserscan_data.json",
    )
    d = json.load(open(res))
    scan = LaserScanData(
        angle_min=d["angle_min"],
        angle_max=d["angle_max"],
        angle_increment=d["angle_increment"],
        time_increment=d["time_increment"],
        scan_time=d["scan_time"],
        ranges=np.array(d["ranges"]),
        range_min=d["range_min"],
        range_max=d["range_max"],
    )
    # 90 deg rotation around z, no planar translation
    transformed = get_laserscan_transformed_polar_coordinates(
        angle_min=scan.angle_min,
        angle_max=scan.angle_max,
        angle_increment=scan.angle_increment,
        laser_scan_ranges=scan.ranges,
        max_scan_range=scan.range_max,
        translation=[0.0, 0.0, 0.173],
        rotation=[0.0, 0.0, 0.7071068, 0.7071068],
    )
    old_range = scan.ranges[scan.angles == scan.angle_min]
    new_range = transformed.ranges[
        np.isclose(transformed.angles, scan.angle_min + np.pi / 2)
    ]
    # range_max-clipped original (inf values clip before transforming)
    expected = min(float(old_range[0]), scan.range_max)
    np.testing.assert_allclose(new_range, expected, rtol=1e-9)


@pytest.mark.parametrize("seed", [2, 9, 31])
def test_rgb_servo_law_lockstep(seed):
    """RGB follower servoing vs the independent transcription of
    ``rgb_follower.cpp:151-223`` over random bboxes/configs."""
    import numpy as np

    from kompass_core_tpu.control.vision_followers import (
        RGBFollowerCore,
        VisionRGBFollowerConfig,
    )
    from kompass_core_tpu.datatypes import Bbox2D
    from kompass_core_tpu.models import (
        AngularCtrlLimits,
        LinearCtrlLimits,
        RobotCtrlLimits,
        RobotType,
    )
    from oracle.vision_impl import rgb_track_target

    rng = np.random.default_rng(seed)
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(
            max_vel=float(rng.uniform(0.5, 2.0)), max_acc=5.0, max_decel=5.0
        ),
        omega_limits=AngularCtrlLimits(
            max_vel=float(rng.uniform(1.0, 3.0)),
            max_acc=5.0,
            max_decel=5.0,
            max_steer=3.1,
        ),
    )
    cfg = VisionRGBFollowerConfig(
        target_distance=float(rng.uniform(0.05, 0.3)),
        tolerance=float(rng.uniform(0.05, 0.2)),
        rotation_gain=float(rng.uniform(0.3, 1.0)),
        speed_gain=float(rng.uniform(0.3, 1.0)),
        min_vel=float(rng.uniform(0.01, 0.1)),
    )
    core = RGBFollowerCore(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        ctrl_limits=limits,
        config=cfg,
    )
    img_w, img_h = 640, 480
    for _ in range(40):
        w = int(rng.integers(10, 300))
        h = int(rng.integers(10, 300))
        x = int(rng.integers(0, img_w - w))
        y = int(rng.integers(0, img_h - h))
        box = Bbox2D(
            top_left_corner=np.array([x, y]),
            size=np.array([w, h]),
            img_size=np.array([img_w, img_h]),
        )
        assert core.run(box)
        got = core.get_ctrl()
        center = box.get_center()
        want, dist_err, ori_err = rgb_track_target(
            box_center_x=center[0],
            box_center_y=center[1],
            box_size_x=w,
            box_size_y=h,
            img_size_x=img_w,
            img_size_y=img_h,
            target_distance=cfg.target_distance,
            tolerance=cfg.tolerance,
            k_omega=cfg.rotation_gain,
            k_v=cfg.speed_gain,
            min_vel=cfg.min_vel,
            max_vel=limits.vx_limits.max_vel,
            max_omega=limits.omega_limits.max_vel,
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(core.dist_error, dist_err, rtol=1e-6)
        np.testing.assert_allclose(
            core.orientation_error, ori_err, rtol=1e-6
        )


# ------------------------------------------- review-fix regressions


def test_spline_closest_point_on_axis_aligned_path():
    """A path lying on the y-axis (every x == 0) must still produce the
    true tracked point — regression for the falsy-zero coordinate check."""
    from kompass_core_tpu.datatypes import InterpolationPoint
    from kompass_core_tpu.py_path_tools import SplineInterpolatedPath

    pts = [
        InterpolationPoint(s=float(s), x=0.0, y=float(s), pitch=math.pi / 2)
        for s in np.linspace(0.0, 4.0, 60)
    ]
    path = SplineInterpolatedPath(seg_len_init=0.05, seg_len_max=6.0)
    path.set_path_points(pts, "map")
    tp = path.get_closest_path_point(0.2, 1.0, yaw=math.pi / 2, speed=1.0)
    assert tp is not None
    assert tp.x == pytest.approx(0.0, abs=1e-6)
    assert tp.y == pytest.approx(1.0, abs=0.06)
    # robot is 0.2 m to the RIGHT of the upward path -> positive lat_dist
    assert tp.lat_dist == pytest.approx(0.2, abs=0.02)
    # degenerate sub-segment request returns an empty segment, no crash
    empty = path.get_path_segment(0.0)
    assert empty.length == 0.0 and empty.spline_x.get_points_len() == 0


def test_motion_cost_params_margins_flow_into_build():
    from kompass_core_tpu.motion_cost import MotionCostsParams

    params = MotionCostsParams()
    built = params.build(robot_radius=0.3)
    # defaults: margins fall back to the shared collision_margin
    assert built["static_collision"].margin == params.collision_margin
    params.set(0.45, 5.0, 0.25, 2.0, 2.0, 0.3)
    built = params.build(robot_radius=0.3)
    assert built["static_collision"].margin == 0.45
    assert built["static_collision"].weight == 5.0
    assert built["dynamic_collision"].margin == 0.25
    assert built["reference"].displacement.weight == pytest.approx(2.0)
    assert built["reference"].heading_cost.weight == pytest.approx(0.3)


def test_pointcloud_raw_accepts_uint8_int_list():
    from kompass_core_tpu.datatypes import pointcloud_to_laserscan_from_raw

    pts = np.zeros((1, 4), np.float32)
    pts[0, :3] = [1.0, 0.0, 0.0]
    byte_list = list(pts.tobytes())  # plain ints 0..255 (ROS payload style)
    assert any(b > 127 for b in byte_list)
    ranges = pointcloud_to_laserscan_from_raw(
        data=byte_list,
        point_step=16,
        row_step=16,
        height=1,
        width=1,
        x_offset=0,
        y_offset=4,
        z_offset=8,
        max_range=10.0,
        min_z=-1.0,
        max_z=1.0,
        num_bins=4,
    )
    assert ranges[0] == pytest.approx(1.0)


def test_reference_cost_update_heading_is_last_index():
    """Upstream asymmetry pinned: displacement accumulates, heading holds
    only the last index's error (reference motion_cost.py:357-359)."""
    from kompass_core_tpu.datatypes import PathPoint
    from kompass_core_tpu.datatypes.path_sample import PathSample
    from kompass_core_tpu.motion_cost import ReferenceCost

    ref_pts = [PathPoint(idx=i, x=float(i), y=0.0) for i in range(4)]
    path = PathSample(2)
    path.set_path([0.0, 1.0], [0.2, 0.2], [0.8, 0.0])
    cost = ReferenceCost(1.0, 1.0)
    cost.update(path, 0, ref_pts)  # heading error 0.8
    d_w, h_w = cost.update(path, 1, ref_pts)  # heading error 0.0
    assert d_w == pytest.approx(0.2)  # 0.1 + 0.1 accumulated
    assert h_w == pytest.approx(0.0)  # last index only


def test_set_traj_points_all_or_nothing():
    from kompass_core_tpu.datatypes import TrajectorySample

    t = TrajectorySample(4)
    before = t.x_points.copy()
    # block runs past the end: nothing may be written
    t.set_traj_points([9.0, 9.0], [9.0, 9.0], [0.0, 0.0], [1.0, 1.0], 3)
    np.testing.assert_array_equal(t.x_points, before)
    assert t.time_points[3] == 0.0
    # set_traj at a new length keeps every SoA array consistent
    t.set_traj([1, 2, 3, 4, 5], [0] * 5, [0] * 5, [0, 1, 2, 3, 4])
    assert len(t.vx_points) == 5 and len(t.omega_points) == 5


def test_init_robot_preserves_calibrated_model(tmp_path):
    from kompass_core_tpu.models import MotionModel2D
    from kompass_core_tpu.simulation import RobotSim

    cfg = tmp_path / "r.yaml"
    cfg.write_text(
        "robot:\n  robot_model_type: DIFFERENTIAL_DRIVE\n"
        "  robot_geometry_type: CYLINDER\n"
        "  robot_geometry_params: [0.2, 0.4]\n"
    )
    sim = RobotSim(model=MotionModel2D(x_dot_prop_vx=0.85))
    sim.init_robot(str(cfg))
    assert sim.robot.state.model.x_dot_prop_vx == 0.85


def test_sample_block_setters_reject_mismatched_lengths():
    """Torn-update guard: mismatched block lengths leave the sample
    completely unchanged (review-fix regression)."""
    from kompass_core_tpu.datatypes import MotionSample, TrajectorySample

    t = TrajectorySample(4)
    before_x = t.x_points.copy()
    t.set_traj_points([1.0, 2.0], [9.0], [0, 0], [0.1, 0.2], 0)  # bad y
    np.testing.assert_array_equal(t.x_points, before_x)
    t.set_points([1.0, 2.0], [9.0], [0.0, 0.0], 0)  # bad y again
    np.testing.assert_array_equal(t.x_points, before_x)
    # mismatched set_traj is rejected wholesale
    m = MotionSample(3)
    m.set_traj([1, 2, 3, 4, 5], [0] * 5, [0] * 5, [0, 1, 2])  # bad time
    assert len(m.x_points) == 3 and len(m.time_points) == 3


def test_motion_cost_params_rejects_negative_margins():
    import pytest as _pytest

    from kompass_core_tpu.motion_cost import MotionCostsParams

    with _pytest.raises(ValueError):
        MotionCostsParams(static_collision_margin=-0.5)
    # None (unset) still falls back to the shared collision_margin
    params = MotionCostsParams()
    built = params.build(0.3)
    assert built["static_collision"].margin == params.collision_margin


def test_read_pcd_ascii_corrupt_token_returns_none(tmp_path):
    """A non-numeric body token is a malformed file -> None per the
    documented contract, not an uncaught ValueError (round-5 review)."""
    from kompass_core_tpu.datatypes.pcd import read_pcd

    bad = tmp_path / "corrupt.pcd"
    bad.write_text(
        "FIELDS x y z\nSIZE 4 4 4\nPOINTS 1\nDATA ascii\n1.0 2.0 x3\n"
    )
    assert read_pcd(str(bad)) is None
