"""Path machinery tests (interpolation, curvature, arc lengths, segments).

Modeled on the reference's interpolation behavior tests
(``tests/test_controllers.py:257-376``) and ``path.cpp`` semantics.
"""

import numpy as np
import pytest

from kompass_core_tpu.datatypes.path import InterpolationType, ReferencePath


def _path_length(xs, ys):
    return float(np.hypot(np.diff(xs), np.diff(ys)).sum())


@pytest.fixture
def curved_points():
    t = np.linspace(0, 1, 8)
    return np.stack([2.0 * t, np.sin(2.0 * t)], axis=1)


def test_straight_interpolation_grid():
    p = ReferencePath([(0.0, 0.0), (10.0, 0.0)])
    p.interpolate(1.0, InterpolationType.LINEAR)
    assert p.size() == 11
    np.testing.assert_allclose(p.xs, np.arange(11.0), atol=1e-6)
    np.testing.assert_allclose(p.arc_lengths, np.arange(11.0), atol=1e-6)
    assert p.total_path_length() == pytest.approx(10.0)


def test_segmentation_straight():
    p = ReferencePath([(0.0, 0.0), (10.0, 0.0)])
    p.interpolate(1.0, InterpolationType.LINEAR)
    p.segment(5.0, 10000)
    # new segments begin where cumulative length >= 5 m (path.cpp:311-329)
    np.testing.assert_array_equal(p.segment_starts, [0, 5, 10])
    assert p.segment_end_index(0) == 4
    assert p.segment_end_index(2) == 10


@pytest.mark.parametrize(
    "itype",
    [
        InterpolationType.LINEAR,
        InterpolationType.CUBIC_SPLINE,
        InterpolationType.HERMITE_SPLINE,
    ],
)
def test_interpolation_preserves_length(curved_points, itype):
    p = ReferencePath(curved_points)
    original_len = _path_length(curved_points[:, 0], curved_points[:, 1])
    p.interpolate(0.01, itype)
    interp_len = _path_length(p.xs, p.ys)
    # resampled length within 2% of chordal length for a gentle curve
    assert interp_len == pytest.approx(original_len, rel=0.02)
    # passes through the endpoints (within a sample spacing)
    assert np.hypot(
        p.xs[0] - curved_points[0, 0], p.ys[0] - curved_points[0, 1]
    ) < 1e-5
    assert np.hypot(
        p.xs[-1] - curved_points[-1, 0], p.ys[-1] - curved_points[-1, 1]
    ) < 0.02


def test_interpolation_hits_knots(curved_points):
    p = ReferencePath(curved_points)
    p.interpolate(0.005, InterpolationType.CUBIC_SPLINE)
    # every original knot should be within one sample spacing of the curve
    for kx, ky in curved_points:
        d = np.min(np.hypot(p.xs - kx, p.ys - ky))
        assert d < 0.01


def test_curvature_of_circle():
    theta = np.linspace(0, 1.5 * np.pi, 200)
    R = 2.0
    pts = np.stack([R * np.cos(theta), R * np.sin(theta)], axis=1)
    p = ReferencePath(pts)
    p.interpolate(0.02, InterpolationType.LINEAR)
    mid = p.curvature[10:-10]
    # |kappa| ~= 1/R on the interior
    assert np.median(np.abs(mid)) == pytest.approx(1.0 / R, rel=0.05)


def test_curvature_straight_is_zero():
    p = ReferencePath([(0.0, 0.0), (10.0, 0.0)])
    p.interpolate(0.1, InterpolationType.LINEAR)
    assert np.allclose(p.curvature, 0.0, atol=1e-5)
