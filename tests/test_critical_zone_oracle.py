"""Critical-zone checker parity vs the serial oracle.

Drives ``ops/critical_zone`` and the independent
``tests/oracle/safety_impl.CriticalZoneOracle`` transcription of
``critical_zone_check.cpp:13-119`` over randomized scans (random sensor
pose, cone widths, radii, NaN/inf dropouts), asserting the slowdown
factor matches in both cone directions."""

import math

import numpy as np
import pytest

from kompass_core_tpu.ops.critical_zone import (
    build_critical_zone,
    get_critical_zone_checker,
)

from oracle.safety_impl import CriticalZoneOracle


@pytest.mark.parametrize("seed", [1, 7, 13, 42])
def test_critical_zone_lockstep(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(180, 720))
    angles = np.linspace(0.0, 2 * math.pi, n, endpoint=False)
    sensor_xy = rng.uniform(-0.1, 0.1, size=2)
    sensor_yaw = rng.uniform(-math.pi, math.pi)
    qz, qw = math.sin(sensor_yaw / 2), math.cos(sensor_yaw / 2)
    cone_deg = float(rng.uniform(40.0, 200.0))
    radius = float(rng.uniform(0.2, 0.5))
    crit = float(rng.uniform(0.1, 0.4))
    slow = crit + float(rng.uniform(0.1, 0.6))

    spec = build_critical_zone(
        robot_shape_type="CYLINDER",
        robot_dimensions=[radius, 0.3],
        sensor_position_body=[sensor_xy[0], sensor_xy[1], 0.0],
        sensor_rotation_body=[0.0, 0.0, qz, qw],
        critical_angle_deg=cone_deg,
        critical_distance=crit,
        slowdown_distance=slow,
        angles=angles,
    )
    checker = get_critical_zone_checker(spec)
    oracle = CriticalZoneOracle(
        robot_radius=radius,
        sensor_x=float(sensor_xy[0]),
        sensor_y=float(sensor_xy[1]),
        sensor_yaw=sensor_yaw,
        critical_angle_deg=cone_deg,
        critical_distance=crit,
        slowdown_distance=slow,
        angles=angles,
    )
    assert [bool(v) for v in spec.forward_mask] == [
        i in set(oracle.indices_forward) for i in range(n)
    ]
    assert [bool(v) for v in spec.backward_mask] == [
        i in set(oracle.indices_backward) for i in range(n)
    ]

    for case in range(12):
        ranges = rng.uniform(crit * 0.5, slow * 4.0, size=n)
        if case % 3 == 1:  # all clear
            ranges = rng.uniform(slow * 2.0, slow * 5.0, size=n)
        if case % 3 == 2:  # NaN/inf dropouts must be skipped, not fatal
            drop = rng.random(n) < 0.1
            ranges = np.where(drop, np.nan, ranges)
            ranges[rng.integers(0, n)] = np.inf
        for forward in (True, False):
            got = float(checker(ranges.astype(np.float32), forward))
            want = oracle.check(ranges.astype(np.float32), forward)
            np.testing.assert_allclose(
                got, want, rtol=1e-5, atol=1e-6,
                err_msg=f"case {case} forward={forward}",
            )


def test_degenerate_full_circle_cone_matches_reference_quirk():
    """A 360-degree critical angle wraps to -pi and empties both cones —
    the checker returns 1.0 everywhere, exactly as upstream
    (``critical_zone_check.cpp:47-48`` + ``angles.h:21-29``)."""
    n = 90
    angles = np.linspace(0.0, 2 * math.pi, n, endpoint=False)
    spec = build_critical_zone(
        robot_shape_type="CYLINDER",
        robot_dimensions=[0.3, 0.3],
        sensor_position_body=[0.0, 0.0, 0.0],
        sensor_rotation_body=[0.0, 0.0, 0.0, 1.0],
        critical_angle_deg=360.0,
        critical_distance=0.2,
        slowdown_distance=0.6,
        angles=angles,
    )
    oracle = CriticalZoneOracle(
        robot_radius=0.3,
        sensor_x=0.0,
        sensor_y=0.0,
        sensor_yaw=0.0,
        critical_angle_deg=360.0,
        critical_distance=0.2,
        slowdown_distance=0.6,
        angles=angles,
    )
    ranges = np.full(n, 0.01, np.float32)  # everything touching the robot
    checker = get_critical_zone_checker(spec)
    assert float(checker(ranges, True)) == 1.0
    assert oracle.check(ranges, True) == 1.0
