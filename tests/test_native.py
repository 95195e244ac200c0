"""Native host library tests: build, parity with the numpy fallbacks."""

import numpy as np
import pytest

from kompass_core_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native host library could not be built")
    return lib


def test_native_builds(lib):
    assert native.native_available()


def test_closest_segment_parity(lib):
    rng = np.random.default_rng(0)
    xs = np.cumsum(rng.uniform(0.01, 0.02, 500)).astype(np.float32)
    ys = np.sin(xs).astype(np.float32)
    seg_starts = np.arange(0, 500, 50, dtype=np.int64)
    for px, py in [(0.5, 0.3), (3.0, 0.0), (8.0, 1.0)]:
        got = native.find_closest_segment(xs, ys, seg_starts, px, py)
        # replicate the descent in pure python
        left, right = 0, len(seg_starts) - 1

        def d(seg):
            i = seg_starts[seg]
            return (px - xs[i]) ** 2 + (py - ys[i]) ** 2

        while left != right:
            mid = (left + right) // 2
            ld, rd = d(left), d(right)
            if mid == right or mid == left:
                expect = left if ld <= rd else right
                break
            if ld <= rd:
                right = mid
            else:
                left = mid
        else:
            expect = left
        assert got == expect


def test_closest_point_tie_keeps_later(lib):
    xs = np.array([0.0, 1.0, 2.0, 1.0, 0.0], np.float32)
    ys = np.zeros(5, np.float32)
    idx, d2 = native.closest_point_on_segment(xs, ys, 0, 4, 1.0, 0.5)
    assert idx == 3  # ties at indices 1 and 3 -> later one wins
    assert d2 == pytest.approx(0.25)


def test_cubic_spline_matches_python(lib):
    s = np.linspace(0, 10, 20)
    y = np.sin(s)
    sq = np.linspace(0, 10, 333)
    native_out = native.cubic_spline_eval(s, y, sq)
    from kompass_core_tpu.datatypes.path import (
        _eval_natural_cubic,
        _natural_cubic_coeffs,
    )

    py_out = _eval_natural_cubic(s, y, _natural_cubic_coeffs(s, y), sq)
    np.testing.assert_allclose(native_out, py_out, atol=1e-9)


def test_scan_block_matches_numpy(lib):
    rng = np.random.default_rng(1)
    ranges = rng.uniform(0.5, 10.0, 100)
    ranges[3] = np.inf
    angles = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    sensor = (0.1, -0.05, 0.2)
    robot = (1.0, 2.0, 0.7)
    blk, n = native.scan_to_obstacle_block(ranges, angles, sensor, robot, 1e8, 128)
    assert n == 100
    # numpy fallback
    import kompass_core_tpu.native as N

    lib_save = N._lib
    N._lib = None
    try:
        import os

        os.environ["KOMPASS_TPU_NO_NATIVE"] = "1"
        blk2, n2 = native.scan_to_obstacle_block(
            ranges, angles, sensor, robot, 1e8, 128
        )
    finally:
        N._lib = lib_save
        os.environ.pop("KOMPASS_TPU_NO_NATIVE", None)
    np.testing.assert_allclose(blk, blk2, rtol=1e-5, atol=1e-4)


def test_segment_block(lib):
    xs = np.linspace(0, 1, 50).astype(np.float32)
    ys = np.zeros(50, np.float32)
    arc = xs.copy()
    seg_x, seg_y, seg_arc, total = native.segment_block(
        xs, ys, arc, 10, 19, 1e8, 16
    )
    assert total == pytest.approx(9 / 49, rel=1e-4)
    np.testing.assert_allclose(seg_x[:10], xs[10:20])
    assert np.all(seg_x[10:] == 1e8)
    assert np.all(seg_arc[10:] == 0.0)


def test_find_lookahead_parity_and_quirks(lib):
    """kh_find_lookahead vs the serial fallback on a switchback path:
    identical (found, x, y, index), last-intersection-wins quirk, and the
    not-found contract."""
    import os

    from kompass_core_tpu import native as N

    rng = np.random.default_rng(11)
    # switchback: out along +x, back along -x at y=0.3 — a circle around
    # the robot intersects both legs; the LAST leg must win
    xs = np.concatenate([np.linspace(0, 4, 60), np.linspace(4, 0, 60)])
    ys = np.concatenate([np.zeros(60), np.full(60, 0.3)])
    xs = xs.astype(np.float32) + rng.normal(0, 1e-3, 120).astype(np.float32)
    ys = ys.astype(np.float32) + rng.normal(0, 1e-3, 120).astype(np.float32)

    cases = [
        (0, 2.0, 0.1, 1.0),   # circle spans both legs
        (0, 2.0, 0.1, 0.05),  # tiny radius: near legs only
        (30, 3.5, 0.0, 0.4),  # resume from a later index
        (0, 10.0, 10.0, 0.5), # far away: no intersection
        (119, 2.0, 0.1, 1.0), # start at last point: empty scan range
    ]
    lib_save = N._lib
    for last_idx, cx, cy, radius in cases:
        got_native = native.find_lookahead(xs, ys, last_idx, cx, cy, radius)
        N._lib = None
        try:
            os.environ["KOMPASS_TPU_NO_NATIVE"] = "1"
            got_py = native.find_lookahead(xs, ys, last_idx, cx, cy, radius)
        finally:
            N._lib = lib_save
            os.environ.pop("KOMPASS_TPU_NO_NATIVE", None)
        assert got_native[0] == got_py[0], (last_idx, cx, cy, radius)
        assert got_native[3] == got_py[3]
        np.testing.assert_allclose(got_native[1:3], got_py[1:3], rtol=1e-12)

    # last-intersection-wins: with the circle covering both legs, the
    # chosen segment must lie on the RETURN leg (index >= 60)
    found, _x, _y, idx = native.find_lookahead(xs, ys, 0, 2.0, 0.1, 1.0)
    assert found and idx >= 60


def test_speed_factor_parity(lib):
    """kh_speed_factor vs the serial fallback: identical factors across
    start indices and lookaheads, incl. the accumulate-before-break
    semantics at the boundary."""
    import os

    from kompass_core_tpu import native as N

    rng = np.random.default_rng(5)
    xs = np.cumsum(rng.uniform(0.005, 0.02, 500)).astype(np.float32)
    ys = np.sin(xs * 2.0).astype(np.float32)
    curv = rng.normal(0, 0.5, 500).astype(np.float32)
    lib_save = N._lib
    for start in (0, 7, 250, 498, 499):
        for lk in (0.05, 0.5, 5.0, 100.0):
            got_n = native.speed_factor(
                xs, ys, curv, start, lk, 0.5, 0.5, 0.3, 0.1
            )
            N._lib = None
            try:
                os.environ["KOMPASS_TPU_NO_NATIVE"] = "1"
                got_p = native.speed_factor(
                    xs, ys, curv, start, lk, 0.5, 0.5, 0.3, 0.1
                )
            finally:
                N._lib = lib_save
                os.environ.pop("KOMPASS_TPU_NO_NATIVE", None)
            assert got_n == got_p, (start, lk, got_n, got_p)


def test_stale_library_degrades_to_fallback(monkeypatch):
    """A pre-built .so missing newer entry points (no compiler to rebuild)
    must degrade to the numpy fallbacks, not crash the first native call."""
    from kompass_core_tpu import native as N

    monkeypatch.setattr(N, "_lib", None)
    monkeypatch.setattr(N, "_build_attempted", False)

    def boom(lib):
        raise AttributeError("undefined symbol: kh_find_lookahead")

    monkeypatch.setattr(N, "_bind_symbols", boom)
    assert N.get_lib() is None
    # fallback path still serves the API
    xs = np.linspace(0, 1, 10).astype(np.float32)
    ys = np.zeros(10, np.float32)
    found, tx, ty, idx = N.find_lookahead(xs, ys, 0, 0.0, 0.0, 0.5)
    assert found and abs(tx - 0.5) < 1e-6


def test_cubic_spline_fallback_degenerate_knots_match_native(lib):
    """n < 2 knots: the C++ kernel outputs the constant y[0] (or zero
    for empty); the numpy fallback must match instead of emitting NaN
    through its clipped [-1] index (round-5 review)."""
    import os

    import kompass_core_tpu.native as N

    sq = np.array([0.0, 1.0, 2.0])
    one_s, one_y = np.array([5.0]), np.array([7.5])
    native_out = native.cubic_spline_eval(one_s, one_y, sq)
    lib_save = N._lib
    N._lib = None
    try:
        os.environ["KOMPASS_TPU_NO_NATIVE"] = "1"
        fb_out = native.cubic_spline_eval(one_s, one_y, sq)
    finally:
        N._lib = lib_save
        os.environ.pop("KOMPASS_TPU_NO_NATIVE", None)
    np.testing.assert_array_equal(native_out, np.full(3, 7.5))
    np.testing.assert_array_equal(fb_out, np.full(3, 7.5))
    assert not np.isnan(fb_out).any()
