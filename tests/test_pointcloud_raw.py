"""Raw PointCloud2-bytes -> laserscan conversion, mirroring the
reference's ``tests/test_pointcloud_data.py:140-290`` cases against
``pointcloud_to_laserscan_from_raw`` (``bindings_utils.cpp:76-121``)."""

import numpy as np
import pytest

from kompass_core_tpu.datatypes import pointcloud_to_laserscan_from_raw

_PC_STRIDE = 16  # xyz float32 + 4 bytes padding


def _make_cloud_bytes(points_xyz: np.ndarray) -> np.ndarray:
    n = points_xyz.shape[0]
    buf = np.zeros((n, 4), dtype=np.float32)
    buf[:, :3] = points_xyz.astype(np.float32)
    return np.frombuffer(buf.tobytes(), dtype=np.int8)


def _convert(cloud, n, max_range=10.0, min_z=0.0, max_z=1.0, **kw):
    return pointcloud_to_laserscan_from_raw(
        data=cloud,
        point_step=_PC_STRIDE,
        row_step=n * _PC_STRIDE,
        height=1,
        width=n,
        x_offset=0,
        y_offset=4,
        z_offset=8,
        max_range=max_range,
        min_z=min_z,
        max_z=max_z,
        **kw,
    )


def test_ring_populates_bins_with_radius():
    n = 100
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    ring = np.column_stack([np.cos(theta), np.sin(theta), np.full(n, 0.5)])
    ranges, angles = _convert(
        _make_cloud_bytes(ring), n, angle_step=0.05
    )
    expected_bins = int(np.ceil(2.0 * np.pi / 0.05))
    assert ranges.shape == (expected_bins,)
    assert angles.shape == (expected_bins,)
    np.testing.assert_allclose(angles[:3], [0.0, 0.05, 0.1])
    populated = int(np.count_nonzero(ranges < 10.0))
    assert populated > 0.4 * expected_bins
    hit = ranges[ranges < 10.0]
    assert np.all(np.abs(hit - 1.0) < 1e-3)


def test_origin_points_are_filtered():
    n = 50
    ranges, _ = _convert(
        _make_cloud_bytes(np.zeros((n, 3), dtype=np.float32)),
        n,
        max_range=5.0,
        min_z=-1.0,
        angle_step=0.1,
    )
    assert np.all(ranges == 5.0)


def test_z_filter_rejects_above_ceiling():
    n = 40
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    above = np.column_stack([np.cos(theta), np.sin(theta), np.full(n, 3.0)])
    ranges, _ = _convert(_make_cloud_bytes(above), n, angle_step=0.1)
    assert np.all(ranges == 10.0)


def test_negative_max_z_disables_ceiling():
    n = 40
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    above = np.column_stack([np.cos(theta), np.sin(theta), np.full(n, 3.0)])
    ranges, _ = _convert(
        _make_cloud_bytes(above), n, max_z=-1.0, angle_step=0.1
    )
    assert np.count_nonzero(ranges < 10.0) > 0


def test_num_bins_overload_returns_ranges_only():
    n = 60
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    ring = np.column_stack(
        [2 * np.cos(theta), 2 * np.sin(theta), np.full(n, 0.2)]
    )
    out = _convert(_make_cloud_bytes(ring), n, num_bins=32)
    assert isinstance(out, np.ndarray) and out.shape == (32,)
    assert np.all(np.abs(out[out < 10.0] - 2.0) < 1e-3)


def test_min_per_bin_and_range_cap():
    # two points in the same direction: the closer one wins; a third
    # beyond max_range leaves its bin at max_range
    pts = np.array(
        [[1.0, 0.0, 0.0], [3.0, 0.0, 0.0], [0.0, 50.0, 0.0]], np.float32
    )
    ranges = _convert(
        _make_cloud_bytes(pts), 3, max_range=10.0, min_z=-1.0, num_bins=4
    )
    assert ranges[0] == pytest.approx(1.0)
    assert ranges[1] == pytest.approx(10.0)


def test_out_of_bounds_points_skipped():
    # truncated buffer: the final point's z read would run off the end
    pts = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    cloud = _make_cloud_bytes(pts)[: 2 * _PC_STRIDE - 6]
    ranges = pointcloud_to_laserscan_from_raw(
        data=cloud,
        point_step=_PC_STRIDE,
        row_step=2 * _PC_STRIDE,
        height=1,
        width=2,
        x_offset=0,
        y_offset=4,
        z_offset=8,
        max_range=10.0,
        min_z=-1.0,
        max_z=1.0,
        num_bins=4,
    )
    assert ranges[0] == pytest.approx(1.0)  # first point intact
    assert ranges[1] == pytest.approx(10.0)  # second skipped as OOB


def test_exactly_one_overload_required():
    with pytest.raises(TypeError):
        pointcloud_to_laserscan_from_raw(
            data=np.zeros(16, np.int8),
            point_step=16,
            row_step=16,
            height=1,
            width=1,
            x_offset=0,
            y_offset=4,
            z_offset=8,
            max_range=10.0,
            min_z=0.0,
            max_z=1.0,
        )


def test_livox_recording_produces_nontrivial_output():
    """A real recorded Livox frame lands distances in a meaningful
    fraction of bins (mirrors reference
    ``test_pointcloud_data.py:262-290``)."""
    import json
    import os

    res = os.path.join(
        os.path.dirname(__file__),
        "resources",
        "reference",
        "mapping",
        "livox_pointcloud_sample_1.json",
    )
    with open(res) as f:
        pc = json.load(f)
    offsets = {fl["name"]: fl["offset"] for fl in pc["fields"]}
    data = np.array(pc["data"]).astype(np.int8)  # uint8 json values wrap
    ranges, angles = pointcloud_to_laserscan_from_raw(
        data=data,
        point_step=pc["point_step"],
        row_step=pc["row_step"],
        height=pc["height"],
        width=pc["width"],
        x_offset=offsets["x"],
        y_offset=offsets["y"],
        z_offset=offsets["z"],
        max_range=20.0,
        min_z=-1.0,
        max_z=2.0,
        angle_step=0.02,
    )
    populated = int(np.count_nonzero(ranges < 20.0))
    assert populated > 0.05 * len(ranges)
    assert np.all(ranges > 0.0) and np.all(ranges <= 20.0)
