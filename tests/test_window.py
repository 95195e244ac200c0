"""Dynamic-window sampling semantics tests.

Pin the grid-walk behavior of ``ops/window.py`` against the reference's
``UpdateReachableVelocityRange`` + sampling loops
(``trajectory_sampler.cpp:181-372``) and the sample-split helpers
(``datatypes/trajectory.h:19-51``).
"""

import numpy as np
import pytest

from kompass_core_tpu.ops.window import (
    MIN_VEL,
    compute_linear_sample_split,
    num_angular_slots,
    sample_velocity_window,
)

LIMITS = np.array([1.0, 5.0, 10.0, 0.0, 0.0, 0.0, 2.0, 3.0, 3.0])


def test_window_bounds_accel_limited():
    w = sample_velocity_window((0.5, 0, 0.1), LIMITS, 0.1, 5, 1, 5, False)
    vx = w.vx_vals[w.vx_mask]
    # window: [0.5 - 10*0.1, 0.5 + 5*0.1] = [-0.5, 1.0]
    assert vx[0] == pytest.approx(-0.5)
    assert vx[-1] == pytest.approx(1.0, abs=1e-6)
    assert len(vx) == 5
    om = w.omega_vals[w.omega_mask]
    # omega window: [0.1 - 0.3, 0.1 + 0.3]
    assert om[0] == pytest.approx(-0.2)
    assert om[-1] == pytest.approx(0.4, abs=1e-6)


def test_window_clamped_by_max_vel():
    w = sample_velocity_window((0.95, 0, 0.0), LIMITS, 0.1, 5, 1, 5, False)
    vx = w.vx_vals[w.vx_mask]
    assert vx[-1] <= 1.0 + 1e-9  # capped at max_vel


def test_min_resolution_masks_overrun():
    """Zero-width window: resolution clamps to 0.001 and only in-window
    slots stay valid (trajectory_sampler.cpp:356-361)."""
    limits = LIMITS.copy()
    limits[1] = limits[2] = 0.0  # no acceleration: window is a point
    w = sample_velocity_window((0.5, 0, 0.0), limits, 0.1, 5, 1, 5, False)
    vx = w.vx_vals[w.vx_mask]
    assert len(vx) == 1
    assert vx[0] == pytest.approx(0.5)


def test_sample_split_rules():
    # non-holonomic: all linear samples to vx, bumped odd, min 3
    assert compute_linear_sample_split(False, 4) == (5, 1)
    assert compute_linear_sample_split(False, 1) == (3, 1)
    # omni: 75/25 split, each bumped odd
    vx_n, vy_n = compute_linear_sample_split(True, 20)
    assert vx_n == 15 and vy_n == 5
    # angular slots bumped odd (trajectory_sampler.cpp:48)
    assert num_angular_slots(4) == 5
    assert num_angular_slots(5) == 5


def test_grid_walk_matches_cpp_accumulation():
    """Values are min + k*res accumulated in float64, never exceeding max
    (the reference's exact for-loop semantics)."""
    w = sample_velocity_window((0.2, 0, 0.0), LIMITS, 0.1, 7, 1, 5, False)
    vx = w.vx_vals[w.vx_mask]
    lo, hi = -0.8, 0.7
    res = (hi - lo) / 6
    expect = []
    v = lo
    while v <= hi and len(expect) < 7:
        expect.append(v)
        v += res
    np.testing.assert_allclose(vx, np.asarray(expect, np.float32), rtol=1e-6)


def test_min_vel_constant_matches_reference():
    assert MIN_VEL == 0.01
