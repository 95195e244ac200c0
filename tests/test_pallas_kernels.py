"""Fused sweep-kernel math parity (CPU: interpret-equivalent formulation).

The real Mosaic kernels only compile on TPU; these tests pin the
mathematical formulation (|p|^2 + |o|^2 - 2 p.o with running min and the
clamp at zero) against the XLA sweep at f32 tolerance, plus the padding /
masking plumbing of `fused_min_dist_sq`'s host-side wrapper. The on-TPU
numeric check of the compiled kernels runs in
``kompass_core_tpu/benchmark/kernel_bench.py`` (asserts rtol 2e-4 against
the XLA path before timing).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kompass_core_tpu.ops.pallas_kernels import (
    fused_min_dist_sq_reference,
)
from kompass_core_tpu.ops.solver import _min_obstacle_dist_sq


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_reference_matches_xla_sweeps(seed):
    rng = np.random.default_rng(seed)
    S, T, O, G = 40, 12, 64, 48
    px = jnp.asarray(rng.uniform(-5, 5, (S, T)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-5, 5, (S, T)).astype(np.float32))
    obs = jnp.asarray(rng.uniform(-8, 8, (O, 2)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-5, 5, G).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-5, 5, G).astype(np.float32))
    pt_mask = jnp.arange(T) < 9

    d2o, d2s = fused_min_dist_sq_reference(px, py, obs, sx, sy, pt_mask)
    ref_o = _min_obstacle_dist_sq(px, py, obs, pt_mask)
    ref_s = _min_obstacle_dist_sq(
        px, py, jnp.stack([sx, sy], axis=1), pt_mask
    )
    np.testing.assert_allclose(
        np.asarray(d2o), np.asarray(ref_o), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d2s), np.asarray(ref_s), rtol=1e-4, atol=1e-5
    )
    # masked points are +inf in both
    assert np.isinf(np.asarray(d2o)[:, 9:]).all()


def test_point_on_obstacle_never_negative():
    """p == o must give d^2 == 0, not a tiny negative (the NaN-sqrt
    hazard the kernels clamp against)."""
    pt = np.float32(3.7)
    px = jnp.full((1, 1), pt)
    py = jnp.full((1, 1), -pt)
    obs = jnp.asarray([[pt, -pt]], jnp.float32)
    d2o, _ = fused_min_dist_sq_reference(
        px, py, obs, jnp.asarray([100.0]), jnp.asarray([100.0]),
        jnp.ones(1, bool),
    )
    assert float(d2o[0, 0]) >= 0.0
    assert float(d2o[0, 0]) < 1e-6


@pytest.mark.parametrize("variant", ["mxu", "vpu"])
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_moving_kernel_interpret_matches_xla(seed, variant):
    """The ACTUAL moving-kernel body (7-feature expansion), run in
    Pallas interpret mode on CPU, must match the XLA moving sweep
    ``_min_obstacle_dist_sq_moving`` and leave the static segment sweep
    untouched. (VERDICT r4 #6: the alternates now carry the time
    term.)"""
    from kompass_core_tpu.ops.pallas_kernels import fused_min_dist_sq
    from kompass_core_tpu.ops.solver import _min_obstacle_dist_sq_moving

    rng = np.random.default_rng(seed)
    S, T, O, G = 40, 12, 64, 48
    dt = 0.1
    px = jnp.asarray(rng.uniform(-5, 5, (S, T)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-5, 5, (S, T)).astype(np.float32))
    obs = jnp.asarray(rng.uniform(-8, 8, (O, 2)).astype(np.float32))
    vel = jnp.asarray(rng.uniform(-1.5, 1.5, (O, 2)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-5, 5, G).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-5, 5, G).astype(np.float32))
    pt_mask = jnp.arange(T) < 9

    d2o, d2s = fused_min_dist_sq(
        px, py, obs, sx, sy, pt_mask, variant=variant,
        obs_vel=vel, time_step=dt, interpret=True,
    )
    ref_o = _min_obstacle_dist_sq_moving(px, py, obs, vel, dt, pt_mask)
    ref_s = _min_obstacle_dist_sq(
        px, py, jnp.stack([sx, sy], axis=1), pt_mask
    )
    # the expanded form cancels |p|^2 + |o|^2 terms of O(100) m^2 to
    # recover d^2 values of O(0.01): absolute error floor ~1e-4 m^2
    np.testing.assert_allclose(
        np.asarray(d2o)[:, :9], np.asarray(ref_o)[:, :9],
        rtol=1e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(d2s)[:, :9], np.asarray(ref_s)[:, :9],
        rtol=1e-4, atol=5e-4,
    )
    assert np.isinf(np.asarray(d2o)[:, 9:]).all()


@pytest.mark.parametrize("variant", ["mxu", "vpu"])
def test_fused_moving_zero_velocity_matches_static_sweep(variant):
    """Zero velocity zeroes features 1, 2, 5, 6 of the expansion, so the
    moving kernel must reduce to the static formulation (the solver-wide
    'static is the zero-velocity special case' contract)."""
    from kompass_core_tpu.ops.pallas_kernels import fused_min_dist_sq

    rng = np.random.default_rng(3)
    S, T, O, G = 16, 8, 32, 32
    px = jnp.asarray(rng.uniform(-5, 5, (S, T)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-5, 5, (S, T)).astype(np.float32))
    obs = jnp.asarray(rng.uniform(-8, 8, (O, 2)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-5, 5, G).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-5, 5, G).astype(np.float32))
    pt_mask = jnp.ones(T, bool)
    d2o, _ = fused_min_dist_sq(
        px, py, obs, sx, sy, pt_mask, variant=variant,
        obs_vel=jnp.zeros((O, 2), jnp.float32), time_step=0.1,
        interpret=True,
    )
    ref_o = _min_obstacle_dist_sq(px, py, obs, pt_mask)
    np.testing.assert_allclose(
        np.asarray(d2o), np.asarray(ref_o), rtol=1e-4, atol=1e-5
    )


def test_moving_pallas_backend_reachable_from_public_config():
    """No NotImplementedError may be reachable from a public config
    (VERDICT r4 #6): a moving-obstacle solve with backend='pallas_vpu'
    must trace (interpret plumbing covers CPU; compiled parity is
    asserted on TPU in benchmark/moving_bench.py)."""
    import dataclasses

    from kompass_core_tpu.ops import pallas_kernels, solver
    from tests.test_solver_modes import _truncate_scenario

    res_xla, _ = _truncate_scenario(drop=False, moving=True)

    orig_solve = solver.dwa_solve
    orig_fused = pallas_kernels.fused_min_dist_sq

    def interp_fused(*args, **kw):
        kw["interpret"] = True
        return orig_fused(*args, **kw)

    def pallas_solve(spec, *args, **kw):
        return orig_solve(
            dataclasses.replace(spec, backend="pallas_vpu"), *args, **kw
        )

    try:
        pallas_kernels.fused_min_dist_sq = interp_fused
        solver.dwa_solve = pallas_solve
        import tests.test_solver_modes as tsm

        tsm.dwa_solve = pallas_solve
        res_pallas, _ = _truncate_scenario(drop=False, moving=True)
    finally:
        pallas_kernels.fused_min_dist_sq = orig_fused
        solver.dwa_solve = orig_solve
        tsm.dwa_solve = orig_solve
    np.testing.assert_allclose(
        np.asarray(res_pallas.costs), np.asarray(res_xla.costs),
        rtol=1e-4, atol=1e-4,
    )
    assert int(res_pallas.best_index) == int(res_xla.best_index)


def test_pallas_backend_truncate_parity_vs_xla(monkeypatch):
    """The pallas code path hands a PRE-truncation d2_seg to the path
    cost; after truncation it must be frozen at path[last_free] exactly
    like d2_obs, or truncated samples' costs diverge from the XLA
    backend. Runs the pallas plumbing on CPU by substituting the Mosaic
    kernel with its reference formulation."""
    import dataclasses

    from kompass_core_tpu.ops import pallas_kernels, solver
    from tests.test_solver_modes import _truncate_scenario

    monkeypatch.setattr(
        pallas_kernels,
        "fused_min_dist_sq",
        lambda px, py, obs, sx, sy, pt_mask, variant="mxu":
        fused_min_dist_sq_reference(px, py, obs, sx, sy, pt_mask),
    )
    orig_solve = solver.dwa_solve
    res_xla, _ = _truncate_scenario(drop=False)

    def pallas_solve(spec, *args, **kw):
        return orig_solve(
            dataclasses.replace(spec, backend="pallas"), *args, **kw
        )

    monkeypatch.setattr(solver, "dwa_solve", pallas_solve)
    # re-import inside _truncate_scenario resolves through the module attr
    from tests import test_solver_modes

    monkeypatch.setattr(test_solver_modes, "dwa_solve", pallas_solve)
    res_pallas, _ = _truncate_scenario(drop=False)

    np.testing.assert_allclose(
        np.asarray(res_pallas.costs), np.asarray(res_xla.costs),
        rtol=1e-5, atol=1e-6,
    )
    assert int(res_pallas.best_index) == int(res_xla.best_index)


@pytest.mark.parametrize("variant", ["mxu", "vpu"])
def test_fused_static_kernel_interpret_matches_xla(variant):
    """The STATIC kernel body in Pallas interpret mode on CPU must match
    the XLA sweeps — the ``interpret`` kwarg is plumbed through the
    static (``obs_vel=None``) path too, not just the moving one
    (round-5 review: it used to be silently ignored there, so a CPU
    caller got a Mosaic lowering attempt instead of interpret mode)."""
    from kompass_core_tpu.ops.pallas_kernels import fused_min_dist_sq

    rng = np.random.default_rng(7)
    S, T, O, G = 40, 12, 64, 48
    px = jnp.asarray(rng.uniform(-5, 5, (S, T)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-5, 5, (S, T)).astype(np.float32))
    obs = jnp.asarray(rng.uniform(-8, 8, (O, 2)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-5, 5, G).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-5, 5, G).astype(np.float32))
    pt_mask = jnp.arange(T) < 9

    d2o, d2s = fused_min_dist_sq(
        px, py, obs, sx, sy, pt_mask, variant=variant, interpret=True,
    )
    ref_o = _min_obstacle_dist_sq(px, py, obs, pt_mask)
    ref_s = _min_obstacle_dist_sq(
        px, py, jnp.stack([sx, sy], axis=1), pt_mask
    )
    np.testing.assert_allclose(
        np.asarray(d2o)[:, :9], np.asarray(ref_o)[:, :9],
        rtol=1e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(d2s)[:, :9], np.asarray(ref_s)[:, :9],
        rtol=1e-4, atol=5e-4,
    )
    assert np.isinf(np.asarray(d2o)[:, 9:]).all()
