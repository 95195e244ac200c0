"""Critical-zone emergency-stop tests.

Modeled on the reference's ``test_laserscan_emergency_stop.py`` +
``critical_zone_test.cpp`` semantics: cone membership, stop/slowdown bands,
forward vs backward motion, pointcloud variant.
"""

import numpy as np
import pytest

from kompass_core_tpu.datatypes import LaserScanData, PointCloudData
from kompass_core_tpu.models import Robot, RobotGeometry, RobotType
from kompass_core_tpu.utils.emergency_stop import EmergencyChecker


RADIUS = 0.51


@pytest.fixture
def checker():
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([RADIUS, 1.0]),
    )
    return EmergencyChecker(
        robot,
        emergency_distance=0.3,
        slowdown_distance=0.6,
        emergency_angle=160.0,
    )


def _scan(front_range, n=72):
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ranges = np.full(n, 10.0)
    ranges[0] = front_range  # beam straight ahead
    return LaserScanData(ranges=ranges, angles=angles)


def test_clear_space_full_speed(checker):
    assert checker.run(scan=_scan(10.0), forward=True) == pytest.approx(1.0)


def test_critical_stop(checker):
    # surface distance = 0.7 - 0.51 = 0.19 < 0.3 -> stop
    assert checker.run(scan=_scan(0.7), forward=True) == pytest.approx(0.0)


def test_slowdown_band_linear(checker):
    # surface distance 0.45 -> factor (0.45-0.3)/(0.6-0.3) = 0.5
    r = RADIUS + 0.45
    assert checker.run(scan=_scan(r), forward=True) == pytest.approx(
        0.5, abs=1e-5
    )


def test_backward_ignores_front_obstacle(checker):
    # obstacle straight ahead is outside the backward cone
    assert checker.run(scan=_scan(0.7), forward=False) == pytest.approx(1.0)


def test_backward_sees_rear_obstacle(checker):
    angles = np.linspace(0, 2 * np.pi, 72, endpoint=False)
    ranges = np.full(72, 10.0)
    ranges[36] = 0.7  # directly behind (pi)
    scan = LaserScanData(ranges=ranges, angles=angles)
    assert checker.run(scan=scan, forward=False) == pytest.approx(0.0)
    assert checker.run(scan=scan, forward=True) == pytest.approx(1.0)


def test_cone_edge_exclusion(checker):
    # 160-degree cone -> half angle 80 deg; obstacle at 90 deg is outside
    angles = np.linspace(0, 2 * np.pi, 72, endpoint=False)
    ranges = np.full(72, 10.0)
    ranges[18] = 0.6  # 90 degrees
    scan = LaserScanData(ranges=ranges, angles=angles)
    assert checker.run(scan=scan, forward=True) == pytest.approx(1.0)


def test_pointcloud_variant():
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([RADIUS, 1.0]),
    )
    checker = EmergencyChecker(
        robot,
        emergency_distance=0.3,
        slowdown_distance=0.6,
        emergency_angle=160.0,
    )
    # dense cloud ring at 5 m + one close point ahead
    theta = np.linspace(0, 2 * np.pi, 1000, endpoint=False)
    pts = np.stack(
        [5 * np.cos(theta), 5 * np.sin(theta), np.zeros_like(theta)], axis=1
    )
    pts = np.vstack([pts, [[0.7, 0.0, 0.0]]]).astype(np.float32)
    cloud = PointCloudData(points=pts)
    assert checker.run(scan=cloud, forward=True) == pytest.approx(0.0)
    assert checker.run(scan=cloud, forward=False) == pytest.approx(1.0)


def test_invalid_distances_raise():
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([RADIUS, 1.0]),
    )
    checker = EmergencyChecker(
        robot,
        emergency_distance=0.6,
        slowdown_distance=0.3,
        emergency_angle=160.0,
    )
    with pytest.raises(ValueError):
        checker.run(scan=_scan(5.0), forward=True)
