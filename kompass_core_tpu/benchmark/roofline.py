"""Roofline / limit analysis for the named reference workloads.

VERDICT r2 #6: the DWA sweep got the full treatment (measured 6.38
ms/batch against an est. f32 VPU roofline => ~80%, KERNEL_BENCH.json);
this module states the bound for the other two named workloads so each
published number carries ``pct_of_roofline`` — "fast" becomes checkable.

All bounds are ESTIMATES from public v5e characteristics:

* VPU f32 peak ~3.9e12 ops/s (4 VPUs x (8, 128) lanes x ~0.94 GHz),
  the same constant bench.py and KERNEL_BENCH.json use.
* MXU bf16 peak ~1.97e14 FLOP/s single-pass (the mapper's one-hot
  lookup runs single-pass after the bf16-exact table split;
  Precision.HIGHEST would be 6 passes => ~3.3e13 FLOP/s).
* HBM ~8.2e11 B/s.

A workload is "at speed of light" when its measured time approaches the
max over its compute-bound and memory-bound floors for the algorithm as
implemented; pct_of_roofline = floor_time / measured_time.

Run: python -m kompass_core_tpu.benchmark.roofline  (writes stdout JSON;
the committed artifact is ROOFLINE.json).
"""

from __future__ import annotations

import json

VPU_F32_PEAK = 3.9e12  # ops/s
MXU_BF16 = 1.97e14  # FLOP/s, single-pass bf16
MXU_F32_HIGHEST = MXU_BF16 / 6.0  # FLOP/s at 6-pass HIGHEST precision
HBM_BW = 8.2e11  # B/s


def cost_evaluator_5k(measured_ms: float) -> dict:
    """CostEvaluator_5k_Trajs (benchmark_runner.cpp:150-185): 5001 GIVEN
    trajectories x 1000 points, 4 costs, straight 10 m path @ 1 cm
    (segment padded to 1024).

    Dominant work: the path-cost sweep — per (sample, point, segment
    point): 2 sub + 2 mul + 1 add + 1 min = 6 fused f32 VPU ops, reduced
    over the segment axis. Everything else (goal/smoothness/jerk, the
    weighted sum) is O(S*T) — three orders smaller.
    """
    S, T, G = 5001, 1000, 1024
    sweep_ops = 6.0 * S * T * G
    compute_floor_s = sweep_ops / VPU_F32_PEAK
    # HBM floor: px, py [S, T] f32 read once; [S] costs out. The [S,T,G]
    # intermediate never materializes (fused reduce).
    bytes_moved = 2 * S * T * 4 + S * 4
    memory_floor_s = bytes_moved / HBM_BW
    floor_s = max(compute_floor_s, memory_floor_s)
    return {
        "name": "CostEvaluator_5k_Trajs",
        "measured_ms": measured_ms,
        "bound": "VPU f32 (path-cost sweep, 5.12e9 point-segment pairs)",
        "sweep_ops": sweep_ops,
        "compute_floor_ms": round(compute_floor_s * 1e3, 3),
        "memory_floor_ms": round(memory_floor_s * 1e3, 4),
        "pct_of_roofline": round(100 * floor_s / (measured_ms * 1e-3), 1),
        "verdict": (
            "VPU-bound; XLA's fused sub/square/min reduce runs the sweep"
            " near the same ~80-90% of f32 peak the DWA sweep shoot-out"
            " measured — no headroom without changing the algorithm"
        ),
    }


def mapper_dense(measured_ms: float) -> dict:
    """Mapper_Dense_400x400 (benchmark_runner.cpp:187-218): 3600-ray scan
    -> 400x400 grid @ 0.05 m.

    Dominant structure: the per-cell candidate-beam lookup as a one-hot
    matmul on the MXU (ops/mapping._candidate_lookup): [160000 cells x
    3600 bins] x [3600 x 35] single-pass bf16 (the 15-bit tables are
    split into bf16-exact hi/lo components, so no HIGHEST-precision
    multi-pass is needed). The gather formulation this replaced measured
    6.4 ms (~8 ns/element serialized TPU gather); the HIGHEST-precision
    matmul form measured 1.54 ms end to end, the bf16 split with a
    chunked lax.map 1.41 ms, and the whole-grid un-chunked dot (one-hot
    generation fused into the dot tiles) 0.59 ms.
    """
    N, B, COLS = 400 * 400, 3600, 35  # 7 split tables x 5 candidates
    matmul_flops = 2.0 * N * B * COLS
    compute_floor_s = matmul_flops / MXU_BF16
    # the one-hot operand is generated per chunk: [16384, 3600] bf16
    # comparisons against an iota — VPU work of N*B compare+selects
    onehot_floor_s = (N * B) / VPU_F32_PEAK
    # HBM floor = tables + base grid + candidate outputs + final grids
    bytes_moved = (B * COLS * 4) + (N * 4) + (N * 5 * 4 * 4) + (N * 4)
    memory_floor_s = bytes_moved / HBM_BW
    floor_s = max(compute_floor_s, onehot_floor_s, memory_floor_s)
    return {
        "name": "Mapper_Dense_400x400",
        "measured_ms": measured_ms,
        "bound": (
            "one-hot generation (5.76e8 VPU compare/selects) over the"
            " single-pass bf16 lookup matmul (4e10 FLOP)"
        ),
        "matmul_flops": matmul_flops,
        "compute_floor_ms": round(compute_floor_s * 1e3, 3),
        "onehot_floor_ms": round(onehot_floor_s * 1e3, 3),
        "memory_floor_ms": round(memory_floor_s * 1e3, 4),
        "pct_of_roofline": round(100 * floor_s / (measured_ms * 1e-3), 1),
        "verdict": (
            "bf16 split + un-chunked whole-grid dot lands within ~3x of"
            " the lookup-matmul floor (the chunked lax.map was the"
            " bottleneck: it blocked fusing one-hot generation into the"
            " dot tiles — 1.41 -> 0.59 ms when removed). Remaining gap"
            " is line-membership VPU work + grid combine; measured"
            " alternatives (gather 6.4 ms, HIGHEST matmul 1.54 ms,"
            " chunked bf16 1.41 ms) are all slower"
        ),
    }


def dwa_sweep(measured_ms_per_batch: float = 6.38) -> dict:
    """The flagship sweep's existing shoot-out result, restated in the
    same schema (KERNEL_BENCH.json is the evidence)."""
    B, S, T = 64, 2025, 30
    pairs = B * S * T * (512 + 512)
    ops = 6.0 * pairs
    floor_s = ops / VPU_F32_PEAK
    return {
        "name": "DWA_sweep_batch64",
        "measured_ms": measured_ms_per_batch,
        "bound": "VPU f32 (obstacle + segment min-distance sweeps)",
        "sweep_ops": ops,
        "compute_floor_ms": round(floor_s * 1e3, 3),
        "memory_floor_ms": None,
        "pct_of_roofline": round(
            100 * floor_s / (measured_ms_per_batch * 1e-3), 1
        ),
        "verdict": (
            "XLA's fused sweep is at speed of light; Pallas VPU/MXU"
            " alternatives measured and falsified (KERNEL_BENCH.json)."
            " CLAUDE.md's earlier '~80%' used a 5-instruction pair count;"
            " this file counts 6 ops/pair (sub, sub, mul, mul, add, min)"
            " uniformly across workloads — same measurement, different"
            " op accounting"
        ),
    }


def build(measured: dict) -> dict:
    return {
        "assumptions": {
            "vpu_f32_peak_ops_s": VPU_F32_PEAK,
            "mxu_bf16_flops_s": MXU_BF16,
            "mxu_f32_highest_flops_s": MXU_F32_HIGHEST,
            "hbm_bytes_s": HBM_BW,
            "note": (
                "public v5e characteristics; floors are per-algorithm"
                " (ops the implementation must execute), so"
                " pct_of_roofline ~100 means no headroom without an"
                " algorithm change"
            ),
        },
        "workloads": [
            cost_evaluator_5k(measured["CostEvaluator_5k_Trajs"]),
            mapper_dense(measured["Mapper_Dense_400x400"]),
            dwa_sweep(measured.get("DWA_sweep_batch64", 6.38)),
        ],
    }


def main():
    # authoritative measurements: device-loop (sub-ms-capable) where
    # available, slope medians otherwise (BENCH_LOCAL.json 2026-08-18,
    # DEVICE_LOOP.json 2026-08-19)
    measured = {
        "CostEvaluator_5k_Trajs": 8.54,
        "Mapper_Dense_400x400": 0.589,
        "DWA_sweep_batch64": 6.30,
    }
    out = build(measured)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
