"""Datatype + config-system tests (LaserScanData zones, BaseAttrs files,
config clamps)."""

import json

import numpy as np
import pytest

from kompass_core_tpu.control import DWAConfig, StanleyConfig
from kompass_core_tpu.datatypes import LaserScanData, PointCloudData


def test_laserscan_default_ring():
    scan = LaserScanData()
    assert scan.angles.size == scan.ranges.size
    assert np.all(scan.ranges == scan.range_max)


def test_laserscan_zone_queries():
    """Angular zone extraction (reference datatypes/laserscan.py:103-157)."""
    angles = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    ranges = np.arange(8, dtype=float)
    scan = LaserScanData(ranges=ranges, angles=angles)
    # zone wrapping through 0: right=-pi/4 .. left=+pi/4
    vals = scan.get_ranges(right_angle=-np.pi / 4, left_angle=np.pi / 4)
    assert set(vals) == {0.0, 1.0, 7.0}
    # non-wrapping zone
    vals2 = scan.get_ranges(right_angle=np.pi / 4, left_angle=3 * np.pi / 4)
    assert set(vals2) == {1.0, 2.0, 3.0}
    assert len(scan.get_angles(-np.pi / 4, np.pi / 4)) == 3


def test_pointcloud_byte_decode():
    """Raw PointCloud2-style decode (reference utils/pointcloud.h:49-88)."""
    pts = np.array(
        [[1.0, 2.0, 3.0], [-1.5, 0.5, 0.25]], dtype=np.float32
    )
    raw = pts.tobytes()
    pc = PointCloudData.from_bytes(raw, point_step=12)
    np.testing.assert_allclose(pc.points, pts)
    # strided layout with extra channel
    pts4 = np.zeros((2, 4), np.float32)
    pts4[:, :3] = pts
    pc2 = PointCloudData.from_bytes(pts4.tobytes(), point_step=16)
    np.testing.assert_allclose(pc2.points, pts)


def test_config_file_round_trip(tmp_path):
    cfg = DWAConfig(max_linear_samples=7, prediction_horizon=15)
    f = str(tmp_path / "dwa.json")
    cfg.to_json_file(f)
    cfg2 = DWAConfig()
    cfg2.from_file(f)
    assert cfg2.max_linear_samples == 7
    assert cfg2.prediction_horizon == 15
    # nested cost weights survive
    assert (
        cfg2.costs_weights.goal_distance_weight
        == cfg.costs_weights.goal_distance_weight
    )


def test_config_nested_root(tmp_path):
    data = {"planner": {"dwa": {"max_angular_samples": 9}}}
    f = tmp_path / "nested.json"
    f.write_text(json.dumps(data))
    cfg = DWAConfig()
    cfg.from_file(str(f), nested_root_name="planner.dwa")
    assert cfg.max_angular_samples == 9


def test_dwa_config_clamps_control_horizon():
    """control_horizon > prediction_horizon clamps (reference
    control/dwa.py:137-143)."""
    cfg = DWAConfig(prediction_horizon=5, control_horizon=9)
    assert cfg.control_horizon == 5


def test_config_validators_reject_out_of_range():
    with pytest.raises(ValueError):
        StanleyConfig(heading_gain=-1.0)
