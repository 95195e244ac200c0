"""Benchmark runner with reference-schema JSON output.

Role of the reference's benchmark suite (``benchmarks/benchmark_common.h``
``measure_performance`` + ``benchmark_runner.cpp`` workloads +
``plot_benchmarks.py``): timed workloads emitting machine-readable JSON per
benchmark and platform. Workloads mirror the reference's named benchmarks
(SURVEY §6) at the same sizes:

  * CostEvaluator_5k_Trajs  — 5001 trajectories x 1000 points, 4 costs
  * Mapper_Dense_400x400    — 3600-ray scan -> 400x400 grid @ 0.05 m
  * Mapper_PointCloud_100k  — 100k-point cloud -> scan -> grid
  * CriticalZone_100k_Cloud — safety factor over a 100k cloud
  * CriticalZone_Dense_Scan — 3600 rays in the slowdown band
  * DWA_2025x30             — full solve, BASELINE workload
  * DWA_Fleet_64            — fleet tick throughput at the measured
                              batch-64 optimum (BATCH_CLIFF.json)
"""

import json
import statistics
import time
from typing import Callable, Dict, List, Optional

import numpy as np


def measure_performance(
    name: str,
    workload: Callable[[], None],
    warmup: int = 2,
    runs: int = 10,
) -> Dict:
    """Time a workload (role of ``benchmark_common.h`` measure_performance).

    The workload must block until device completion.
    """
    for _ in range(warmup):
        workload()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        workload()
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    return {
        "name": name,
        "runs": runs,
        "mean_ms": statistics.fmean(samples),
        "min_ms": samples[0],
        "p50_ms": samples[len(samples) // 2],
        "p99_ms": samples[min(len(samples) - 1, int(len(samples) * 0.99))],
    }


def slope_variants_needed(n_lo: int = 10, n_hi: int = 30) -> int:
    """Distinct inputs measure_throughput_slope consumes: one per
    dispatch across warmup (1), the cache-settling chain (min(5, n_lo)),
    and both timed chains (n_lo + n_hi)."""
    return 1 + min(5, n_lo) + n_lo + n_hi


def measure_throughput_slope(
    name: str,
    dispatch: Callable,
    variants: List,
    fetch: Callable,
    n_lo: int = 10,
    n_hi: int = 30,
) -> Dict:
    """Sustained-throughput measurement robust to remote-attached devices.

    Blocking per-call timing (``measure_performance``) silently breaks on
    remote runtimes where ``block_until_ready`` resolves before execution
    completes and identical dispatches may be served from a cache. This
    variant times growing chains of DISTINCT pre-resident inputs and
    reports the marginal (slope) time per dispatch, forcing completion
    with a value ``fetch`` from the final output — the method bench.py
    uses for every published number.

    EVERY dispatch — warmup and both timed chains — consumes its own
    distinct variant via one running iterator: restarting each chain at
    variants[0] would re-dispatch identical (executable, input) pairs,
    which this runtime may serve from a cache, silently deflating the
    slope (the exact failure mode CLAUDE.md's protocol forbids).

    ``variants``: >= ``slope_variants_needed(n_lo, n_hi)`` distinct
    device-resident inputs. ``dispatch(v) -> out``; ``fetch(out)`` must
    pull a value to host.
    """
    needed = slope_variants_needed(n_lo, n_hi)
    assert len(variants) >= needed, (
        f"need {needed} distinct inputs (one per dispatch across warmup"
        f" + both chains), got {len(variants)}"
    )
    it = iter(variants)
    fetch(dispatch(next(it)))  # warm/compile

    def chain(n):
        vs = [next(it) for _ in range(n)]
        t0 = time.perf_counter()
        outs = [dispatch(v) for v in vs]
        fetch(outs[-1])
        return time.perf_counter() - t0

    chain(min(5, n_lo))
    t_lo, t_hi = chain(n_lo), chain(n_hi)
    ms = max((t_hi - t_lo) / (n_hi - n_lo) * 1e3, 1e-9)
    return {
        "name": name,
        "runs": n_hi - n_lo,
        "mean_ms": ms,
        "min_ms": ms,
        "p50_ms": ms,
        "p99_ms": ms,
        "method": "slope",
    }


class BenchmarkRunner:
    """Builds and runs the reference-equivalent workload suite on the
    current JAX backend."""

    def __init__(self, platform: Optional[str] = None):
        import jax

        self.device = jax.devices()[0]
        self.platform = platform or f"{self.device.platform}_{self.device.device_kind}".replace(" ", "_")
        self.results: List[Dict] = []

    # --- workload builders ---

    def _dwa_workload(self, n_vx, n_omega, max_points, scan, seg, label):
        import jax

        from ..models import (
            AngularCtrlLimits,
            LinearCtrlLimits,
            RobotCtrlLimits,
        )
        from ..ops.solver import (
            SolverSpec,
            get_packed_dwa_solver,
            pack_solver_input,
            packed_input_size,
        )
        from ..ops.window import sample_velocity_window

        spec = SolverSpec(
            is_omni=False,
            n_vx=n_vx,
            n_vy=1,
            n_omega=n_omega,
            max_points=max_points,
            # control horizon matches the BASELINE flagship spec
            # (benchmark/baseline.py num_ctrl_points=6) so DWA_2025x30
            # measures the SAME compiled program bench.py headlines
            num_ctrl_points=6,
            scan_size=scan,
            seg_size=seg,
            drop_samples=True,
        )
        limits = RobotCtrlLimits(
            vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
            omega_limits=AngularCtrlLimits(max_vel=2.0, max_acc=3.0, max_decel=3.0),
        ).to_array()
        limits[3:6] = 0.0
        rng = np.random.default_rng(0)
        n_seg = seg - 8
        s = np.linspace(0, 10.0, n_seg).astype(np.float32)
        seg_x = np.full(seg, 1e8, np.float32)
        seg_y = np.full(seg, 1e8, np.float32)
        seg_arc = np.zeros(seg, np.float32)
        seg_x[:n_seg] = s
        seg_arc[:n_seg] = s
        seg_y[:n_seg] = 0.0
        ranges = rng.uniform(2.0, 9.0, scan)
        ang = np.linspace(-np.pi, np.pi, scan, endpoint=False)
        obs = np.stack(
            [ranges * np.cos(ang), ranges * np.sin(ang)], axis=1
        ).astype(np.float32)
        window = sample_velocity_window(
            (0.5, 0.0, 0.0), limits, 0.1, spec.n_vx, spec.n_vy, spec.n_omega,
            False,
        )
        params = np.array(
            [0.1, 0.3, 0.05, 2.0, 1.0, 1.0, 0.1, 0.05, 5.0, 0.0, 3.0, 10 / 3],
            np.float32,
        )
        buf = np.zeros(packed_input_size(spec), np.float32)
        pack_solver_input(
            spec, buf, params, (0.0, 0.0, 0.0), window, obs, scan,
            seg_x, seg_y, seg_arc, n_seg, float(s[-1]), 10.0, max_points,
        )
        solver = get_packed_dwa_solver(spec)
        # one DISTINCT resident input per dispatch (state x perturbed):
        # identical re-dispatches may be cache-served on remote runtimes,
        # so every workload here is slope-timed over distinct variants
        variants = []
        for k in range(slope_variants_needed()):
            v = buf.copy()
            v[0] += 1e-4 * k
            variants.append(jax.device_put(v))
        for v in variants:
            float(np.asarray(v[0]))
        return solver, variants

    def bench_cost_evaluator_5k(self):
        """The reference's exact CostEvaluator_5k_Trajs workload
        (``benchmark_runner.cpp:36-185``): 5001 GIVEN trajectories x 1000
        points (center path + sinusoidal linear/angular fluctuation
        pairs), straight 10 m path interpolated at 1 cm, 4 active costs
        {path, goal, smoothness, jerk} = 1.0, NO obstacles — evaluated by
        the standalone ``evaluate_trajectory_costs`` (the decoupled
        CostEvaluator API)."""
        import jax

        from ..ops.solver import SolverParams, get_cost_evaluator

        import jax.numpy as jnp

        S, T = 5001, 1000
        dt = 0.01
        v1 = 1.0
        max_fluct = 0.5
        pairs = (S - 1) // 2
        amp = max_fluct / max(pairs, 1)

        # build the 100 MB sample set ON DEVICE (a host->device transfer
        # of this size through the remote tunnel takes minutes)
        @jax.jit
        def build_heavy_samples():
            i = jnp.arange(T, dtype=jnp.float32)
            fl = jnp.sin(2.0 * jnp.pi * i / T)
            k = jnp.arange(S)
            a = ((k + 1) // 2).astype(jnp.float32) * amp
            odd = (k % 2) == 1  # linear-fluctuation samples
            ang = (k % 2 == 0) & (k > 0)  # angular-fluctuation samples
            px = jnp.broadcast_to(dt * v1 * i, (S, T))
            py = jnp.where(
                odd[:, None], dt * (a[:, None] * fl[None, :]) * i[None, :],
                0.0,
            )
            vx = jnp.full((S, T - 1), v1, jnp.float32)
            vy = jnp.where(odd[:, None], a[:, None] * fl[None, :-1], 0.0)
            w = jnp.where(ang[:, None], a[:, None] * fl[None, :-1], 0.0)
            return px, py, jnp.stack([vx, vy, w], axis=-1)

        px, py, vels = build_heavy_samples()
        float(np.asarray(px[0, 0]))  # force resident

        G = 1024  # 1001-point interpolated path padded
        s = 0.01 * np.arange(1001, dtype=np.float32)
        seg_x = np.full(G, 1e8, np.float32)
        seg_y = np.full(G, 1e8, np.float32)
        seg_arc = np.zeros(G, np.float32)
        seg_x[:1001] = s
        seg_y[:1001] = 0.0
        seg_arc[:1001] = s
        params = SolverParams.create(
            time_step=dt,
            robot_radius=0.3,
            collision_margin=0.05,
            weights={
                "reference_path_distance_weight": 1.0,
                "goal_distance_weight": 1.0,
                "obstacles_distance_weight": 0.0,
                "smoothness_weight": 1.0,
                "jerk_weight": 1.0,
            },
            acc_limits=(3.0, 3.0, 3.0),
            max_obstacles_dist=10.0 / 3,
        )
        obs = np.full((128, 2), 1e8, np.float32)
        ev = get_cost_evaluator(with_obstacles=False)
        args = [
            jax.device_put(a)
            for a in (
                px, py, vels, obs, np.int32(0), seg_x, seg_y, seg_arc,
                np.int32(1001), np.float32(10.0), np.float32(10.0),
                np.int32(T),
            )
        ]

        # slope-timed over DISTINCT dispatches (ref_total_len perturbed
        # per variant so no dispatch can be served from a cache); a
        # blocking round-trip through the dev tunnel adds ~30 ms of pure
        # RTT and would swamp the device time
        variants = [
            jax.device_put(np.float32(10.0 + 1e-4 * k))
            for k in range(slope_variants_needed())
        ]
        # force EVERYTHING resident before timing (the protocol's
        # residency rule): a transfer landing inside a timed chain would
        # add a full tunnel round trip to that chain
        for a in args:
            float(np.asarray(a.ravel()[0]))  # device-side scalar slice
        for v in variants:
            float(np.asarray(v))
        self.results.append(
            measure_throughput_slope(
                "CostEvaluator_5k_Trajs",
                lambda rtl: ev(
                    params, *args[:10], rtl, args[11]
                ),
                variants,
                lambda res: float(np.asarray(res.cost)),
            )
        )

    def bench_dwa_baseline(self):
        solver, variants = self._dwa_workload(
            45, 45, 30, 512, 384, "baseline"
        )
        self.results.append(
            measure_throughput_slope(
                "DWA_2025x30", solver, variants,
                lambda o: float(np.asarray(o[1])),
            )
        )

    def bench_dwa_large_batch(self):
        """BASELINE config 4: large-batch sampling, 65,025 trajectories
        (255 x 255 velocity grid) x 30 steps with on-device cost
        reduction + argmin (GPU-benchmark-scale parity)."""
        solver, variants = self._dwa_workload(
            255, 255, 30, 512, 384, "large"
        )
        self.results.append(
            measure_throughput_slope(
                "DWA_LargeBatch_65k", solver, variants,
                lambda o: float(np.asarray(o[1])),
            )
        )

    def bench_fleet(self, batch=64):
        import jax

        import os
        import sys

        root = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..")
        )
        if root not in sys.path:
            sys.path.insert(0, root)
        from bench import build_scenario, build_spec  # repo-root bench module
        from ..parallel.fleet import make_fleet_solver

        spec = build_spec()
        rng = np.random.default_rng(0)
        solver = make_fleet_solver(spec)
        base = np.stack([build_scenario(spec, rng, i) for i in range(batch)])
        variants = []
        for k in range(slope_variants_needed()):
            v = base.copy()
            v[:, 0] += 1e-4 * k
            variants.append(jax.device_put(v))
        for v in variants:  # force resident before timing
            float(np.asarray(v[0, 0]))

        r = measure_throughput_slope(
            f"DWA_Fleet_{batch}",
            solver,
            variants,
            lambda o: float(np.asarray(o[0, 1])),
        )
        r["solves_per_s"] = batch / (r["mean_ms"] / 1e3)
        self.results.append(r)

    def bench_mapper_dense(self):
        """3600 rays -> 400x400 grid @ 0.05 m
        (reference ``benchmark_runner.cpp:187-218``)."""
        import jax

        from ..ops.mapping import MapperSpec, get_scan_to_grid

        spec = MapperSpec(
            grid_height=400, grid_width=400, num_bins=3600, resolution=0.05
        )
        rng = np.random.default_rng(0)
        fn = get_scan_to_grid(spec)
        variants = [
            jax.device_put(rng.uniform(0.5, 9.9, 3600).astype(np.float32))
            for _ in range(slope_variants_needed())
        ]
        for v in variants:
            float(np.asarray(v[0]))
        self.results.append(
            measure_throughput_slope(
                "Mapper_Dense_400x400", fn, variants,
                lambda o: int(np.asarray(o[0, 0])),
            )
        )

    def bench_mapper_pointcloud(self):
        """100k-point cloud -> laserscan -> grid
        (reference ``benchmark_runner.cpp:227-265``)."""
        import jax
        import jax.numpy as jnp

        from ..ops.mapping import (
            MapperSpec,
            get_pointcloud_to_scan,
            get_scan_to_grid,
        )

        spec = MapperSpec(
            grid_height=400, grid_width=400, num_bins=3600, resolution=0.05
        )
        rng = np.random.default_rng(0)
        n = 100_000
        r = rng.uniform(0.5, 9.9, n)
        a = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack(
            [r * np.cos(a), r * np.sin(a), rng.uniform(-0.5, 0.5, n)], axis=1
        ).astype(np.float32)
        to_scan = get_pointcloud_to_scan(spec.num_bins)
        to_grid = get_scan_to_grid(spec)
        fused = __import__("jax").jit(
            lambda p: to_grid(
                to_scan(p, jnp.float32(10.0), jnp.float32(-1.0), jnp.float32(1.0))
            )
        )
        pts_dev = jax.device_put(pts)
        # distinct variants built ON DEVICE (30 x 1.2 MB host uploads
        # through a remote tunnel would dominate setup)
        shift = jax.jit(lambda p, c: p + c)
        variants = [
            shift(pts_dev, np.float32(1e-5 * k))
            for k in range(slope_variants_needed())
        ]
        for v in variants:
            float(np.asarray(v[0, 0]))
        self.results.append(
            measure_throughput_slope(
                "Mapper_PointCloud_100k", fused, variants,
                lambda o: int(np.asarray(o[0, 0])),
            )
        )

    def bench_mapper_bayesian(self):
        """Bayesian 400x400 update (reference CPU-side
        ``Mapper_Dense_400x400`` variant: Bayesian, 10 threads,
        ``benchmark_runner.cpp:187-218``) — inverse sensor model +
        previous-grid fusion, same 3600-ray scan."""
        import jax

        from ..ops.mapping import MapperSpec, get_scan_to_grid_bayesian

        spec = MapperSpec(
            grid_height=400, grid_width=400, num_bins=3600, resolution=0.05
        )
        rng = np.random.default_rng(0)
        fn = get_scan_to_grid_bayesian(spec)
        prev = jax.device_put(
            np.full((400, 400), 0.5, np.float32)
        )
        # exact sensor-model values from the reference benchmark's
        # constructor call — single source shared with the device-loop
        # harness so the two measurements of this workload can't drift
        from .device_loop import BAYES_BENCH_SCALARS

        scalars = tuple(np.float32(v) for v in BAYES_BENCH_SCALARS)
        variants = [
            jax.device_put(rng.uniform(0.5, 9.9, 3600).astype(np.float32))
            for _ in range(slope_variants_needed())
        ]
        for v in variants:
            float(np.asarray(v[0]))
        float(np.asarray(prev[0, 0]))
        self.results.append(
            measure_throughput_slope(
                "Mapper_Bayesian_400x400",
                lambda r: fn(r, prev, *scalars),
                variants,
                lambda o: float(np.asarray(o[1][0, 0])),
            )
        )

    def bench_critical_zone_cloud(self):
        """100k cloud safety factor (reference
        ``benchmark_runner.cpp:267-311``): cylinder r=0.51, 160 deg cone,
        0.3/0.6 m zones."""
        import jax

        from ..ops.critical_zone import (
            build_critical_zone,
            get_critical_zone_checker_cloud,
        )

        angles = np.arange(0.0, 2 * np.pi, 2 * np.pi / 3600)
        spec = build_critical_zone(
            "CYLINDER", [0.51, 1.0], (0, 0, 0), (0, 0, 0, 1),
            160.0, 0.3, 0.6, angles,
        )
        rng = np.random.default_rng(0)
        n = 100_000
        r = rng.uniform(0.9, 9.9, n)
        a = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack(
            [r * np.cos(a), r * np.sin(a), rng.uniform(-0.4, 0.4, n)], axis=1
        ).astype(np.float32)
        fn = get_critical_zone_checker_cloud(spec)
        pts_dev = jax.device_put(pts)
        shift = jax.jit(lambda p, c: p + c)
        variants = [
            shift(pts_dev, np.float32(1e-5 * k))
            for k in range(slope_variants_needed())
        ]
        for v in variants:
            float(np.asarray(v[0, 0]))
        self.results.append(
            measure_throughput_slope(
                "CriticalZone_100k_Cloud",
                lambda p: fn(
                    p, True, np.float32(20.0), np.float32(-1.0),
                    np.float32(1.0),
                ),
                variants,
                lambda o: float(o),
            )
        )

    def bench_critical_zone_dense(self):
        """3600 rays forced into the slowdown band 0.81-1.11 m (reference
        ``benchmark_runner.cpp:313-376`` worst case)."""
        import jax

        from ..ops.critical_zone import (
            build_critical_zone,
            get_critical_zone_checker,
        )

        angles = np.arange(0.0, 2 * np.pi, 2 * np.pi / 3600)
        spec = build_critical_zone(
            "CYLINDER", [0.51, 1.0], (0, 0, 0), (0, 0, 0, 1),
            160.0, 0.3, 0.6, angles,
        )
        rng = np.random.default_rng(0)
        fn = get_critical_zone_checker(spec)
        variants = [
            jax.device_put(rng.uniform(0.81, 1.11, 3600).astype(np.float32))
            for _ in range(slope_variants_needed())
        ]
        for v in variants:
            float(np.asarray(v[0]))
        self.results.append(
            measure_throughput_slope(
                "CriticalZone_Dense_Scan",
                lambda r: fn(r, True),
                variants,
                lambda o: float(o),
            )
        )

    # --- suite ---

    def run_all(self):
        self.bench_dwa_baseline()
        self.bench_dwa_large_batch()
        self.bench_fleet()
        self.bench_cost_evaluator_5k()
        self.bench_mapper_dense()
        self.bench_mapper_bayesian()
        self.bench_mapper_pointcloud()
        self.bench_critical_zone_cloud()
        self.bench_critical_zone_dense()
        return self.results

    def run_repeated(self, repeats: int = 5):
        """Run the suite ``repeats`` times and keep, per workload, the
        MEDIAN slope estimate (plus every raw estimate under
        ``estimates_ms``).

        A single slope estimate through a remote-attached tunnel is
        noisy for sub-millisecond dispatches, and the noise is
        two-sided: interference landing in the LONG chain inflates the
        slope, while interference landing in the SHORT chain deflates
        it (observed: a 0.000 ms estimate for a real 0.2 ms workload).
        The median is robust to outliers in either direction; min/max
        are not. Heavy workloads (>4 ms) are stable within ~2% across
        repeats either way."""
        all_runs: List[List[Dict]] = []
        for _ in range(max(1, repeats)):
            self.results = []
            self.run_all()
            all_runs.append(self.results)
        merged = []
        for i in range(len(all_runs[0])):
            names = {run[i]["name"] for run in all_runs}
            assert len(names) == 1, (
                f"pass results diverged at index {i}: {sorted(names)} — "
                "workloads must be identical across repeats"
            )
            ests = sorted(run[i]["p50_ms"] for run in all_runs)
            med = ests[len(ests) // 2] if len(ests) % 2 else statistics.median(ests)
            rec = dict(min(
                (run[i] for run in all_runs),
                key=lambda r: abs(r["p50_ms"] - med),
            ))
            rec["p50_ms"] = rec["mean_ms"] = med
            rec["estimates_ms"] = [run[i]["p50_ms"] for run in all_runs]
            rec["method"] = f"slope_median_of_{len(all_runs)}"
            merged.append(rec)
        self.results = merged
        return self.results

    def export(self, file_path: str):
        payload = {"platform": self.platform, "benchmarks": self.results}
        with open(file_path, "w") as f:
            json.dump(payload, f, indent=2)
        return payload


def plot_benchmarks(result_files: List[str], save_path: str = "benchmarks.png"):
    """Grouped log-scale latency chart across platforms (role of
    ``plot_benchmarks.py``)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    data = [json.load(open(f)) for f in result_files]
    names = [b["name"] for b in data[0]["benchmarks"]]
    width = 0.8 / len(data)
    fig, ax = plt.subplots(figsize=(10, 5))
    for i, d in enumerate(data):
        vals = [b["mean_ms"] for b in d["benchmarks"]]
        ax.bar(
            np.arange(len(names)) + i * width, vals, width,
            label=d["platform"],
        )
    ax.set_yscale("log")
    ax.set_ylabel("mean latency [ms]")
    ax.set_xticks(np.arange(len(names)) + 0.4)
    ax.set_xticklabels(names, rotation=30, ha="right")
    ax.legend()
    fig.tight_layout()
    fig.savefig(save_path)
    return save_path


if __name__ == "__main__":
    import sys

    runner = BenchmarkRunner()
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if repeats > 1:
        runner.run_repeated(repeats)
    else:
        runner.run_all()
    out = runner.export(
        sys.argv[1] if len(sys.argv) > 1 else "benchmark_results.json"
    )
    print(json.dumps(out, indent=2))
