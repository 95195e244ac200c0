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
