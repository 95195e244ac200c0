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
            " the lookup-matmul floor; the lookup is 95% of the update"
            " (benchmark/mapper_split.py: 0.52 of 0.55 ms). FIVE"
            " alternatives measured and falsified: gather 6.4 ms,"
            " HIGHEST-precision matmul 1.54, chunked bf16 lax.map 1.41,"
            " banded-XLA static-window dot 0.81 (w512) / 2.08 (w384),"
            " banded-Pallas (VMEM window slice via scalar prefetch) 1.07"
            " — vs full 0.50 on the same healthy-tunnel pass"
            " (mapper_split --modes 2026-08-20; the 2026-08-19"
            " degraded-tunnel passes agreed on the ordering). The banded forms'"
            " ~6x FLOP cut is eaten by per-tile overheads (rhs slice"
            " copies / unfused batched one-hot / 625 small grid steps),"
            " so the remaining roofline gap is not reachable by lookup"
            " restructuring; the floor itself under-counts the one-hot"
            " generation at 1 VPU op per (cell, bin)"
        ),
    }


def mapper_bayesian(measured_ms: float) -> dict:
    """Mapper_Bayesian_400x400 (the reference CPU benchmark's Bayesian
    configuration, benchmark_runner.cpp:187-218): same per-cell candidate
    lookup as Mapper_Dense plus the inverse-sensor-model Bayes update.

    The Bayes layer is elementwise over the grid (160k cells x ~20 f32
    ops = 3.2e6 VPU ops, < 1 us at peak) — the floor is the Dense
    lookup's floor; measured times confirm (Bayesian 0.52 ms vs Dense
    0.54 ms slope medians: the extra layer is free).
    """
    base = mapper_dense(measured_ms)
    floor_ms = max(
        base["compute_floor_ms"], base["onehot_floor_ms"],
        base["memory_floor_ms"],
    )
    return {
        "name": "Mapper_Bayesian_400x400",
        "measured_ms": measured_ms,
        "bound": base["bound"] + " (Bayes update is elementwise, ~1 us)",
        "compute_floor_ms": base["compute_floor_ms"],
        "onehot_floor_ms": base["onehot_floor_ms"],
        "memory_floor_ms": base["memory_floor_ms"],
        "pct_of_roofline": round(100 * floor_ms / measured_ms, 1),
        "verdict": (
            "identical structure to Mapper_Dense — the inverse-sensor-"
            "model update fuses into the per-cell combine for free"
        ),
    }


def _bin_min_floor_ms(n_points: int, num_bins: int) -> float:
    """Dense per-bin min (ops/mapping._bin_min, TPU branch): per
    (point, bin) pair an eq-compare + select + min = 3 f32 VPU ops,
    fused into one tiled pass (the [N, B] tensor never materializes;
    HBM traffic is the N points, ~1.5 us — compute-bound)."""
    return 1e3 * (3.0 * n_points * num_bins) / VPU_F32_PEAK


def critical_zone_100k(measured_ms: float) -> dict:
    """CriticalZone_100k_Cloud (benchmark_runner.cpp:267-311): 100k-point
    cloud -> 3600-bin min ranges -> masked slowdown-factor min.

    Dominant work: the dense bin-min (100k x 3600 pairs). The scan check
    itself is 3600 elements (~10 f32 ops each, ~0.01 us at peak) and the
    per-point prep (z/origin filters, atan2, sqrt) is O(N) — both noise
    next to the N x B pass.
    """
    N, B = 100_000, 3600
    binning_floor_ms = _bin_min_floor_ms(N, B)
    bytes_moved = N * 3 * 4 + B * 4
    memory_floor_ms = 1e3 * bytes_moved / HBM_BW
    floor_ms = max(binning_floor_ms, memory_floor_ms)
    return {
        "name": "CriticalZone_100k_Cloud",
        "measured_ms": measured_ms,
        "bound": "VPU f32 (dense per-bin min, 3.6e8 point-bin pairs)",
        "binning_floor_ms": round(binning_floor_ms, 3),
        "memory_floor_ms": round(memory_floor_ms, 4),
        "pct_of_roofline": round(100 * floor_ms / measured_ms, 1),
        "verdict": (
            "the dense [N, B] compare/select/min pass replaced a"
            " serialized segment_min scatter (~0.8 ms of ~8 ns/point"
            " scatter -> 0.28 ms of fused VPU work; workload 0.69 ->"
            " 0.40 ms, device-loop spread 0.005 ms). Remaining ~30% gap"
            " is the per-point prep + non-pow2 bin axis (3600) tiling"
        ),
    }


def mapper_pointcloud(measured_ms: float) -> dict:
    """Mapper_PointCloud_100k (benchmark_runner.cpp:227-265): 100k cloud
    -> 3600-bin scan (dense bin-min) -> Mapper_Dense grid update. The
    floor is the sum of the two stages' floors (they share no work)."""
    N, B = 100_000, 3600
    binning_floor_ms = _bin_min_floor_ms(N, B)
    dense = mapper_dense(measured_ms)  # floors only; measured unused
    dense_floor_ms = max(
        dense["compute_floor_ms"], dense["onehot_floor_ms"],
        dense["memory_floor_ms"],
    )
    floor_ms = binning_floor_ms + dense_floor_ms
    return {
        "name": "Mapper_PointCloud_100k",
        "measured_ms": measured_ms,
        "bound": (
            "dense bin-min (3.6e8 point-bin pairs) + the Mapper_Dense"
            " lookup matmul, sequential stages"
        ),
        "binning_floor_ms": round(binning_floor_ms, 3),
        "grid_stage_floor_ms": round(dense_floor_ms, 3),
        "pct_of_roofline": round(100 * floor_ms / measured_ms, 1),
        "verdict": (
            "both stages carry the same headroom they have standalone"
            " (binning ~70%, grid lookup ~35% of their floors); the"
            " stages are data-dependent so they cannot overlap"
        ),
    }


def critical_zone_dense(measured_device_us: float,
                        measured_dispatch_ms: float) -> dict:
    """CriticalZone_Dense_Scan (benchmark_runner.cpp:313-376): 3600 rays
    in the slowdown band — the reference's CPU worst case (its loop cannot
    early-exit). On TPU the workload is LATENCY-bound, not compute-bound:
    3600 elements x ~10 f32 ops = 3.6e4 VPU ops is ~0.01 us of compute
    inside a ~1.5 us minimum program execution (measured by the K-delta
    device loop, DEVICE_LOOP.json), under a ~0.2 ms per-dispatch pipeline
    floor through the remote tunnel. pct_of_roofline is reported against
    the 1.5 us device execution: the number says "program-launch bound",
    not "VPU bound" — there is no throughput lever here, only dispatch
    amortization (run_ticks_on_device / the fused fleet tick, which embed
    this check at zero marginal cost)."""
    compute_floor_us = 1e6 * (10.0 * 3600) / VPU_F32_PEAK
    memory_floor_us = 1e6 * (3600 * 4 * 3) / HBM_BW
    floor_us = max(compute_floor_us, memory_floor_us)
    return {
        "name": "CriticalZone_Dense_Scan",
        "measured_device_us": measured_device_us,
        "measured_dispatch_ms": measured_dispatch_ms,
        "bound": "program launch (~1.5 us), not VPU (~0.01 us of work)",
        "compute_floor_us": round(compute_floor_us, 3),
        "memory_floor_us": round(memory_floor_us, 3),
        "pct_of_roofline": round(100 * floor_us / measured_device_us, 1),
        "verdict": (
            "latency-bound: the scan is 3 orders too small to fill the"
            " chip. The honest costs are ~1.5 us on-device (K-delta"
            " loop) and ~0.2 ms per remote dispatch (pipeline floor);"
            " fleet/serving paths fuse the check into the solve tick"
            " where its marginal cost is ~0"
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
            mapper_bayesian(measured["Mapper_Bayesian_400x400"]),
            mapper_pointcloud(measured["Mapper_PointCloud_100k"]),
            critical_zone_100k(measured["CriticalZone_100k_Cloud"]),
            critical_zone_dense(
                measured["CriticalZone_Dense_device_us"],
                measured["CriticalZone_Dense_dispatch_ms"],
            ),
            dwa_sweep(measured.get("DWA_sweep_batch64", 6.38)),
        ],
    }


def main():
    # authoritative measurements: device-loop (sub-ms-capable) where
    # available, slope medians otherwise (BENCH_LOCAL.json /
    # DEVICE_LOOP.json, final 2026-08-19 re-measure)
    measured = {
        "CostEvaluator_5k_Trajs": 8.14,
        "Mapper_Dense_400x400": 0.58,
        "Mapper_Bayesian_400x400": 0.59,
        "Mapper_PointCloud_100k": 0.99,
        "CriticalZone_100k_Cloud": 0.402,
        "CriticalZone_Dense_device_us": 1.5,
        "CriticalZone_Dense_dispatch_ms": 0.201,
        "DWA_sweep_batch64": 6.30,
    }
    out = build(measured)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
