"""Backend shoot-out for the solver's min-distance sweeps on real TPU.

Measures, with the slope method (growing chains of DISTINCT
device-resident batches, completion forced by a value fetch — the only
trustworthy timing through the remote-attached tunnel, see CLAUDE.md):

  1. the isolated sweep kernels (XLA fused reduce vs the fused Pallas
     kernel's mxu/vpu variants) on the BASELINE point/obstacle shapes,
  2. the full batch-64 DWA solve per backend — the decisive number.

Run: PYTHONPATH=. python -m kompass_core_tpu.benchmark.kernel_bench
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def slope_time(fn, variants, probe, n_lo=10, n_hi=40):
    """Marginal seconds per call over chains of distinct inputs — one
    variant per dispatch across warmup + both chains (``k % len`` reuse
    would let identical (executable, input) pairs repeat, the deflation
    mode CLAUDE.md's protocol forbids)."""
    needed = 5 + n_lo + n_hi
    assert len(variants) >= needed, (
        f"need {needed} distinct inputs, got {len(variants)}"
    )
    it = iter(variants)

    def chain(n):
        vs = [next(it) for _ in range(n)]
        t0 = time.time()
        outs = [fn(v) for v in vs]
        probe(outs[-1])
        return time.time() - t0

    chain(5)
    t_lo, t_hi = chain(n_lo), chain(n_hi)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def bench_sweeps(B=64, S=2025, T=30, O=512, G=384):
    import jax
    import jax.numpy as jnp

    from kompass_core_tpu.ops.pallas_kernels import fused_min_dist_sq
    from kompass_core_tpu.ops.solver import _min_obstacle_dist_sq

    pt_mask = jnp.ones(T, bool)

    # generate inputs ON DEVICE (host->device transfer of ~33 MB/variant
    # through the tunnel is slow and flaky)
    @jax.jit
    def gen(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 5)
        return (
            jax.random.uniform(ks[0], (B, S, T), minval=-5, maxval=5),
            jax.random.uniform(ks[1], (B, S, T), minval=-5, maxval=5),
            jax.random.uniform(ks[2], (B, O, 2), minval=-8, maxval=8),
            jax.random.uniform(ks[3], (B, G), minval=-5, maxval=5),
            jax.random.uniform(ks[4], (B, G), minval=-5, maxval=5),
        )

    # one distinct input per dispatch; shorter chains (5+5+20) keep the
    # resident variant set ~1 GB at these [B,S,T] shapes
    variants = []
    for k in range(5 + 5 + 20):
        v = gen(k)
        float(np.asarray(v[0][0, 0, 0]))  # force materialized
        variants.append(v)

    results = {}
    probe = lambda out: float(np.asarray(out[0][0, 0, 0]))  # noqa: E731

    xla_jit = jax.jit(
        jax.vmap(
            lambda p, q, o, a, b: (
                _min_obstacle_dist_sq(p, q, o, pt_mask),
                _min_obstacle_dist_sq(p, q, jnp.stack([a, b], 1), pt_mask),
            )
        )
    )
    t0 = time.time()
    xla_jit(*variants[0])
    log(f"xla compile {time.time()-t0:.1f}s")
    results["xla_two_sweeps_ms"] = (
        slope_time(lambda v: xla_jit(*v), variants, probe, n_lo=5, n_hi=20) * 1e3
    )

    for variant in ("mxu", "vpu"):
        fn = jax.jit(
            jax.vmap(
                lambda p, q, o, a, b, _v=variant: fused_min_dist_sq(
                    p, q, o, a, b, pt_mask, variant=_v
                )
            )
        )
        t0 = time.time()
        fn(*variants[0])
        log(f"pallas_{variant} compile {time.time()-t0:.1f}s")
        # numeric check vs xla
        ref = xla_jit(*variants[0])
        got = fn(*variants[0])
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(g), rtol=2e-4, atol=1e-4
            )
        results[f"pallas_{variant}_two_sweeps_ms"] = (
            slope_time(lambda v, _f=fn: _f(*v), variants, probe, n_lo=5, n_hi=20)
            * 1e3
        )
    return results


def bench_full_solve(backends=("xla", "pallas", "pallas_vpu"), B=64):
    import dataclasses

    import jax

    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    if root not in sys.path:  # same guard as runner.bench_fleet
        sys.path.insert(0, root)
    from bench import build_scenario, build_spec
    from kompass_core_tpu.parallel.fleet import make_fleet_solver

    rng = np.random.default_rng(0)
    spec0 = build_spec()
    base = np.stack([build_scenario(spec0, rng, i) for i in range(B)])
    variants_np = []
    for k in range(1 + 5 + 10 + 40):  # compile + warm + both chains
        v = base.copy()
        v[:, 0] += 1e-4 * k
        variants_np.append(v)

    results = {}
    for backend in backends:
        spec = dataclasses.replace(spec0, backend=backend)
        solver = make_fleet_solver(spec)
        variants = [jax.device_put(v) for v in variants_np]
        for v in variants:
            float(np.asarray(v[0, 0]))
        t0 = time.time()
        out = solver(variants[0])
        variants = variants[1:]  # compile consumed its own variant
        row = np.asarray(out[0])
        log(
            f"{backend}: compile {time.time()-t0:.1f}s "
            f"found={row[0] > 0.5} cost={row[1]:.4f} adm={int(row[3])}"
        )
        per_batch = slope_time(
            solver, variants, lambda o: float(np.asarray(o[0, 1]))
        )
        us_per_solve = per_batch / B * 1e6
        results[f"solve_{backend}_us"] = us_per_solve
        log(f"{backend}: {us_per_solve:.1f} us/solve ({B/per_batch:,.0f}/s)")
    return results


def main():
    from kompass_core_tpu.utils.runtime import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import jax

    log(f"device: {jax.devices()[0]}")
    out = {}
    out.update(bench_sweeps())
    log(json.dumps(out, indent=2))
    out.update(bench_full_solve())
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
