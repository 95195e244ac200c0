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
