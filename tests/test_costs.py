"""Golden-value unit tests for each cost kernel.

Mirrors the reference's analytic cost tests
(``src/kompass_cpp/tests/cost_evaluator_test.cpp:217-461``): goal cost 0.6
on a straight path, tie-breakers 0.61/0.65, path cost 0 centered and
(d + d/L)/2 offset, smoothness 1/12, jerk 2/12, obstacle cost {0, 1, 0.5}.
These values pin the cost formula contracts for cross-backend parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kompass_core_tpu.datatypes.path import InterpolationType, ReferencePath
from kompass_core_tpu.ops.solver import (
    _goal_cost,
    _jerk_cost,
    _min_obstacle_dist_sq,
    _obstacles_cost,
    _path_cost,
    _smoothness_cost,
)


def _obstacle_cost_full(px, py, obs, active_points, max_dist):
    """Helper matching the in-solver pipeline: shared distance sweep then
    cost."""
    T = px.shape[1]
    pt_mask = jnp.arange(T) < active_points
    d2 = _min_obstacle_dist_sq(jnp.asarray(px), jnp.asarray(py), obs, pt_mask)
    return _obstacles_cost(d2, max_dist)

SEG_PAD = 64
OBS_PAD = 32


@pytest.fixture
def straight_ref():
    """10 m straight path, interp 1 m, segment 5 m: segment 0 = X 0..4."""
    p = ReferencePath([(0.0, 0.0), (10.0, 0.0)])
    p.interpolate(1.0, InterpolationType.LINEAR)
    p.segment(5.0, 10000)
    return p


def _segment_arrays(path, seg_idx):
    sl = path.segment_slice(seg_idx)
    seg_x = np.full(SEG_PAD, 1e8, np.float32)
    seg_y = np.full(SEG_PAD, 1e8, np.float32)
    seg_arc = np.zeros(SEG_PAD, np.float32)
    xs = path.xs[sl]
    n = len(xs)
    seg_x[:n] = xs
    seg_y[:n] = path.ys[sl]
    seg_arc[:n] = path.arc_lengths[sl]
    seg_len = float(np.hypot(np.diff(xs), np.diff(path.ys[sl])).sum())
    return seg_x, seg_y, seg_arc, n, seg_len


def _traj_at(points):
    """[T, 2] path points -> px, py arrays shaped [1, T]."""
    pts = np.asarray(points, np.float32)
    return pts[None, :, 0], pts[None, :, 1]


def test_goal_cost_on_straight_path(straight_ref):
    seg_x, seg_y, seg_arc, n, _ = _segment_arrays(straight_ref, 0)
    px, py = _traj_at([(4.0, 0.0)] * 5)
    cost = _goal_cost(
        jnp.asarray(px), jnp.asarray(py), seg_x, seg_y, seg_arc,
        jnp.float32(straight_ref.total_path_length()), jnp.int32(5),
    )
    assert float(cost[0]) == pytest.approx(0.6, abs=1e-4)


def test_goal_cost_tie_breaker(straight_ref):
    seg_x, seg_y, seg_arc, n, _ = _segment_arrays(straight_ref, 0)
    ref_len = jnp.float32(straight_ref.total_path_length())
    for offset, expected in [(0.1, 0.61), (0.5, 0.65)]:
        px, py = _traj_at([(4.0, offset)] * 5)
        cost = _goal_cost(
            jnp.asarray(px), jnp.asarray(py), seg_x, seg_y, seg_arc,
            ref_len, jnp.int32(5),
        )
        assert float(cost[0]) == pytest.approx(expected, abs=1e-4)


def test_goal_cost_arc_follower_beats_chord_cutter():
    """Regression semantics of cost_evaluator_test.cpp:239-277: on a 3/4
    circle the arc-remaining goal cost must rank the arc follower below the
    chord cutter."""
    R = 2.0
    theta = np.linspace(0, 1.5 * np.pi, 60)
    p = ReferencePath(np.stack([R * np.cos(theta), R * np.sin(theta)], axis=1))
    p.interpolate(0.05, InterpolationType.LINEAR)
    p.segment(20.0, 100000)
    sl = p.segment_slice(0)
    n = sl.stop - sl.start
    pad = ((n + 63) // 64) * 64
    seg_x = np.full(pad, 1e8, np.float32)
    seg_y = np.full(pad, 1e8, np.float32)
    seg_arc = np.zeros(pad, np.float32)
    seg_x[:n] = p.xs[sl]
    seg_y[:n] = p.ys[sl]
    seg_arc[:n] = p.arc_lengths[sl]
    total = p.total_path_length()

    follow_pt = (R * np.cos(0.5), R * np.sin(0.5))
    chord_pt = (1.5, -0.5)
    px, py = _traj_at([follow_pt] * 5)
    follow = float(
        _goal_cost(jnp.asarray(px), jnp.asarray(py), seg_x, seg_y, seg_arc,
                   jnp.float32(total), jnp.int32(5))[0]
    )
    px, py = _traj_at([chord_pt] * 5)
    chord = float(
        _goal_cost(jnp.asarray(px), jnp.asarray(py), seg_x, seg_y, seg_arc,
                   jnp.float32(total), jnp.int32(5))[0]
    )
    assert follow == pytest.approx((total - R * 0.5) / total, rel=0.02)
    assert chord == pytest.approx(1.0 + np.sqrt(0.5) / total, rel=0.02)
    assert follow < chord


def test_path_cost_centered_sample(straight_ref):
    seg_x, seg_y, seg_arc, n, seg_len = _segment_arrays(straight_ref, 0)
    px, py = _traj_at([(float(i), 0.0) for i in range(5)])
    cost = _path_cost(
        jnp.asarray(px), jnp.asarray(py), seg_x, seg_y,
        (seg_x[n - 1], seg_y[n - 1]), jnp.float32(seg_len), jnp.int32(5),
    )
    assert float(cost[0]) == pytest.approx(0.0, abs=1e-4)


def test_path_cost_constant_lateral_offset(straight_ref):
    seg_x, seg_y, seg_arc, n, seg_len = _segment_arrays(straight_ref, 0)
    d = 0.5
    px, py = _traj_at([(float(i), d) for i in range(5)])
    cost = _path_cost(
        jnp.asarray(px), jnp.asarray(py), seg_x, seg_y,
        (seg_x[n - 1], seg_y[n - 1]), jnp.float32(seg_len), jnp.int32(5),
    )
    expected = (d + d / seg_len) / 2.0
    assert float(cost[0]) == pytest.approx(expected, abs=1e-4)


ACC_LIMITS = (jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))


def _vel_traj(vx_seq):
    v = np.zeros((1, len(vx_seq), 3), np.float32)
    v[0, :, 0] = vx_seq
    return jnp.asarray(v)


def test_smoothness_constant_velocity():
    cost = _smoothness_cost(_vel_traj([1, 1, 1, 1]), jnp.int32(5), ACC_LIMITS)
    assert float(cost[0]) == pytest.approx(0.0, abs=1e-6)


def test_smoothness_single_step_change():
    cost = _smoothness_cost(_vel_traj([0, 1, 1, 1]), jnp.int32(5), ACC_LIMITS)
    assert float(cost[0]) == pytest.approx(1.0 / 12.0, abs=1e-4)


def test_jerk_constant_acceleration():
    cost = _jerk_cost(
        _vel_traj([0.1, 0.2, 0.3, 0.4]), jnp.int32(5), ACC_LIMITS
    )
    assert float(cost[0]) == pytest.approx(0.0, abs=1e-5)


def test_jerk_known_second_diff():
    cost = _jerk_cost(_vel_traj([0, 1, 3, 6]), jnp.int32(5), ACC_LIMITS)
    assert float(cost[0]) == pytest.approx(2.0 / 12.0, abs=1e-4)


def _obstacles(points):
    obs = np.full((OBS_PAD, 2), 1e8, np.float32)
    for i, p in enumerate(points):
        obs[i] = p
    return jnp.asarray(obs)


@pytest.mark.parametrize(
    "obstacle,expected",
    [((20.0, 0.0), 0.0), ((0.0, 0.0), 1.0), ((5.0, 0.0), 0.5)],
)
def test_obstacles_cost_extremes(obstacle, expected):
    # max_sensor_range 30 / 3 -> maxObstaclesDist = 10
    px, py = _traj_at([(0.0, 0.0)] * 5)
    cost = _obstacle_cost_full(
        px, py, _obstacles([obstacle]), jnp.int32(5), jnp.float32(10.0)
    )
    assert float(cost[0]) == pytest.approx(expected, abs=1e-4)


def test_masked_points_do_not_contribute():
    """Points beyond active_points must be excluded from every kernel."""
    px, py = _traj_at([(0.0, 0.0)] * 3 + [(100.0, 100.0)] * 2)
    cost = _obstacle_cost_full(
        px, py, _obstacles([(100.0, 100.0)]), jnp.int32(3), jnp.float32(10.0)
    )
    # active points are all at origin, 141 m from the obstacle -> cost 0
    assert float(cost[0]) == pytest.approx(0.0, abs=1e-4)
