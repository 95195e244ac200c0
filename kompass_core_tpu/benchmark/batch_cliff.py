"""Root-cause harness for the batch-64 -> 80 throughput cliff.

Background (CLAUDE.md perf notes): per-solve time of the vmapped
flagship DWA program is ~118 us at dispatch batch 64 but jumps to
~152 us at batch 80 — `make_fleet_solver` chunks fleets at 64 as a
workaround. This harness measures the cliff cleanly and captures the
compiler's side of the story:

1. ``sweep()`` device-loop-times one batched solve per batch size
   (K carry-chained batch dispatches inside one program — RTT-immune,
   see ``device_loop.py``) and reports us/solve per batch.
2. ``hlo_stats()`` compiles the batched program at chosen batch sizes
   and summarizes the optimized HLO: fusion count, reduce/loop fusion
   shapes of the two distance sweeps, and any layout/padding changes —
   the diff between 64 and 80 identifies what the compiler changed.

Run on the real chip:
    python -m kompass_core_tpu.benchmark.batch_cliff          # measure
    python -m kompass_core_tpu.benchmark.batch_cliff hlo      # HLO diff

Results are committed to ``BATCH_CLIFF.json``.
"""

from __future__ import annotations

import json
import re
import statistics
import sys
import time
from collections import Counter
from functools import partial
from typing import Sequence

import numpy as np


def _flagship_spec():
    from ..ops.solver import SolverSpec

    return SolverSpec(
        is_omni=False, n_vx=45, n_vy=1, n_omega=45, max_points=30,
        num_ctrl_points=6, scan_size=512, seg_size=384, drop_samples=True,
    )


_BASE_ROW_CACHE: dict = {}


def _scenario_matrix(spec, batch: int, salt: float = 0.0) -> np.ndarray:
    """[batch, L] distinct packed scenarios (reuses the runner's flagship
    workload builder for row 0 — built ONCE per spec and cached: the
    builder uploads + resident-fetches ~46 buffers through the tunnel,
    which would otherwise repeat per variant per batch size (~2-4 min of
    pure setup waste) — then perturbs robot state per row/salt."""
    if spec not in _BASE_ROW_CACHE:
        import jax

        from .runner import BenchmarkRunner

        r = BenchmarkRunner()
        _, variants = r._dwa_workload(
            spec.n_vx, spec.n_omega, spec.max_points, spec.scan_size,
            spec.seg_size, "cliff",
        )
        _BASE_ROW_CACHE[spec] = np.asarray(jax.device_get(variants[0]))
    base = _BASE_ROW_CACHE[spec]
    mat = np.tile(base, (batch, 1))
    mat[:, 0] += 1e-4 * np.arange(batch) + salt
    return mat


def make_batched_device_loop(spec, batch: int, k: int):
    """One jitted program: K carry-chained batched solves ([batch, L])."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.solver import _unpack_and_solve

    solve = jax.vmap(partial(_unpack_and_solve, spec))

    def loop(mat):
        def body(m, _):
            out = solve(m)
            # data dependency on every row's cost: forces serial
            # iterations and keeps all rows live
            m = m.at[:, 0].add(1e-6 + 1e-9 * out[:, 1])
            return m, out[0, 1]

        _, costs = lax.scan(body, mat, None, length=k)
        return costs[-1]

    return jax.jit(loop)


def sweep(
    batches: Sequence[int] = (32, 48, 64, 72, 80, 96, 128),
    ks=(4, 20),
    repeats: int = 5,
) -> list:
    """us/solve per dispatch batch size, device-loop timed."""
    import jax

    spec = _flagship_spec()
    results = []
    for b in batches:
        f1 = make_batched_device_loop(spec, b, ks[0])
        f2 = make_batched_device_loop(spec, b, ks[1])
        n_var = 2 * repeats + 2
        variants = []
        for i in range(n_var):
            m = _scenario_matrix(spec, b, salt=1e-3 * i)
            variants.append(jax.device_put(m))
        for v in variants:
            float(np.asarray(v[0, 0]))
        it = iter(variants)
        t0 = time.time()
        float(np.asarray(f1(next(it))))
        float(np.asarray(f2(next(it))))
        compile_s = time.time() - t0
        ests = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(np.asarray(f1(next(it))))
            t1 = time.perf_counter()
            float(np.asarray(f2(next(it))))
            t2 = time.perf_counter()
            per_batch = ((t2 - t1) - (t1 - t0)) / (ks[1] - ks[0])
            ests.append(per_batch / b * 1e6)
        med = statistics.median(ests)
        rec = {
            "batch": b,
            "us_per_solve": round(med, 2),
            "estimates_us": [round(e, 2) for e in ests],
            "spread_us": round(max(ests) - min(ests), 2),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
    return results


# --- HLO side ----------------------------------------------------------

_FUSION_RE = re.compile(r"=\s+(\S+)\s+fusion\(", re.MULTILINE)
_KIND_RE = re.compile(r"kind=(k\w+)")


def hlo_stats(batch: int) -> dict:
    """Compile the batched solve at ``batch`` and summarize the optimized
    HLO: fusion kinds, the shapes of every fusion touching the two
    distance sweeps (scan 512 / segment 384->512 padded), and dominant
    reduce shapes."""
    import jax

    from ..ops.solver import _unpack_and_solve, packed_input_size

    spec = _flagship_spec()
    solve = jax.jit(jax.vmap(partial(_unpack_and_solve, spec)))
    args = np.zeros((batch, packed_input_size(spec)), np.float32)
    hlo = solve.lower(args).compile().as_text()

    kinds = Counter(_KIND_RE.findall(hlo))
    # every instruction line: "  %name = <shape> op(...)"
    shapes = Counter()
    reduce_shapes = Counter()
    for m in re.finditer(
        r"=\s+((?:f32|bf16|s32|pred)\[[\d,]*\](?:\{[\d,]*\})?)\s+(\w[\w-]*)\(",
        hlo,
    ):
        shape, op = m.groups()
        if op == "fusion":
            shapes[shape] += 1
        elif op == "reduce":
            reduce_shapes[shape] += 1
    return {
        "batch": batch,
        "hlo_bytes": len(hlo),
        "fusion_kinds": dict(kinds),
        "fusion_output_shapes_top": dict(shapes.most_common(12)),
        "reduce_output_shapes": dict(reduce_shapes.most_common(12)),
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "hlo":
        out = [hlo_stats(b) for b in (48, 64, 72, 128)]
    else:
        out = sweep()
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
