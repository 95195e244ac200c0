"""Device-loop timing: a tunnel-immune cross-check for the slope method.

The slope method (``runner.measure_throughput_slope``) times chains of
independent dispatches and relies on the host keeping the device queue
full. Through a remote-attached tunnel that pipelining sometimes breaks,
and the marginal time then includes a full host round-trip per dispatch —
observed as a bimodal DWA_2025x30 estimate (~0.12 ms vs ~0.98 ms across
repeats, the high mode being ≈ tunnel RTT).

This harness removes the host from the measured region entirely: ONE
jitted program runs the workload K times in a ``lax.scan`` whose carry
feeds each iteration's input from the previous iteration's output (a
data dependency, so iterations execute serially and XLA cannot CSE or
hoist them). Wall time for a K-iteration dispatch is

    T(K) = RTT + overhead + K * t_workload

so ``t = (T(K2) - T(K1)) / (K2 - K1)`` cancels RTT, dispatch overhead,
and the output fetch exactly. Each timed dispatch still gets a DISTINCT
resident input buffer (measurement-integrity rule: identical
(executable, input) pairs may be served from a cache).

Role in the suite: a methodology cross-check for sub-millisecond
workloads; the reference-schema numbers stay slope-timed
(``runner.py``), with this module's number reported alongside when the
slope repeats disagree.
"""

from __future__ import annotations

import json
import statistics
import time
from functools import partial
from typing import Callable, List, Sequence

import numpy as np


def make_dwa_device_loop(spec, k: int):
    """One jitted program: K carry-chained DWA solves on a packed buffer.

    The carry perturbs the robot x-state by 1e-6 + 1e-9*cost each
    iteration — a data dependency on the previous solve (forces serial
    execution, defeats CSE) that keeps the scenario physically valid.
    Returns the final cost scalar (forces the whole chain).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.solver import _unpack_and_solve

    solve = partial(_unpack_and_solve, spec)

    def loop(buf):
        def body(b, _):
            out = solve(b)
            b = b.at[0].add(1e-6 + 1e-9 * out[1])
            return b, out[1]

        _, costs = lax.scan(body, buf, None, length=k)
        return costs[-1]

    return jax.jit(loop)


def measure_device_loop(
    name: str,
    make_loop: Callable[[int], Callable],
    variants: Sequence,
    ks: Sequence[int] = (8, 40),
    repeats: int = 3,
) -> dict:
    """Per-iteration device time from the K-delta of single dispatches.

    ``variants`` must hold >= ``2 * repeats + 2`` DISTINCT
    device-resident inputs: two warmup dispatches (one per compiled K)
    plus two per timed repeat. Returns the median across repeats plus
    every raw estimate and the spread (max - min).
    """
    k1, k2 = ks
    assert len(variants) >= 2 * repeats + 2, (
        f"need >= {2 * repeats + 2} distinct variants "
        f"(2 warmup + 2 per repeat), got {len(variants)}"
    )
    f1, f2 = make_loop(k1), make_loop(k2)
    it = iter(variants)
    # compile + warm both programs (distinct inputs, untimed)
    float(np.asarray(f1(next(it))))
    float(np.asarray(f2(next(it))))
    ests: List[float] = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(f1(next(it))))
        t1 = time.perf_counter()
        float(np.asarray(f2(next(it))))
        t2 = time.perf_counter()
        ests.append(((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3)
    med = statistics.median(ests)
    return {
        "name": name,
        "method": f"device_loop_k{k1}_k{k2}",
        "p50_ms": med,
        "mean_ms": med,
        "estimates_ms": ests,
        "spread_ms": max(ests) - min(ests),
        "repeats": repeats,
    }


def make_critical_zone_device_loop(spec, k: int):
    """K carry-chained critical-zone checks in one dispatch. The carry
    perturbs each range by 1e-6 * previous factor (factor in [0, 1], so
    the ranges stay inside the slowdown band)."""
    import jax
    from jax import lax

    from ..ops.critical_zone import get_critical_zone_checker

    check = get_critical_zone_checker(spec)

    def loop(ranges):
        def body(r, _):
            f = check(r, True)
            return r + (1e-6 * f + 1e-7), f

        _, fs = lax.scan(body, ranges, None, length=k)
        return fs[-1]

    return jax.jit(loop)


def make_mapper_device_loop(spec, k: int):
    """K carry-chained dense scan->grid updates in one dispatch. The
    carry perturbs the ranges by a value derived from the occupancy
    count (data dependency on the previous grid)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.mapping import get_scan_to_grid

    to_grid = get_scan_to_grid(spec)

    def loop(ranges):
        def body(r, _):
            g = to_grid(r)
            occ = jnp.sum(g).astype(jnp.float32)
            return r + (1e-9 * occ + 1e-7), occ

        _, occs = lax.scan(body, ranges, None, length=k)
        return occs[-1]

    return jax.jit(loop)


def make_critical_zone_cloud_device_loop(spec, k: int):
    """K carry-chained 100k-point cloud safety checks in one dispatch.
    The carry perturbs the whole cloud by 1e-6 * previous factor."""
    import jax
    from jax import lax

    from ..ops.critical_zone import get_critical_zone_checker_cloud

    check = get_critical_zone_checker_cloud(spec)

    def loop(pts):
        def body(p, _):
            f = check(
                p, True, np.float32(20.0), np.float32(-1.0),
                np.float32(1.0),
            )
            return p + (1e-6 * f + 1e-7), f

        _, fs = lax.scan(body, pts, None, length=k)
        return fs[-1]

    return jax.jit(loop)


# Reference benchmark_runner.cpp:187-218 constructs the Bayesian mapper
# with these exact sensor-model values (p_prior, p_empty, p_occupied,
# range_sure, range_max, wall_size).
BAYES_BENCH_SCALARS = (0.6, 0.1, 0.9, 0.1, 20.0, 0.2)


def make_mapper_bayesian_device_loop(spec, k: int):
    """K carry-chained Bayesian grid updates in one dispatch. The carry
    is (ranges, prob_grid): each iteration fuses into the PREVIOUS
    iteration's posterior — the real temporal-fusion recurrence, which
    is also the data dependency that forces serial execution."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.mapping import get_scan_to_grid_bayesian

    fn = get_scan_to_grid_bayesian(spec)
    scalars = tuple(np.float32(v) for v in BAYES_BENCH_SCALARS)

    def loop(carry):
        ranges, prev = carry

        def body(c, _):
            r, p = c
            occ, prob = fn(r, p, *scalars)
            out = jnp.sum(occ).astype(jnp.float32)
            return (r + (1e-9 * out + 1e-7), prob), out

        _, outs = lax.scan(body, (ranges, prev), None, length=k)
        return outs[-1]

    return jax.jit(loop)


def make_mapper_pointcloud_device_loop(spec, k: int):
    """K carry-chained (100k cloud -> laserscan -> grid) updates in one
    dispatch; carry perturbs the cloud by a value derived from the
    occupancy count."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.mapping import get_pointcloud_to_scan, get_scan_to_grid

    to_scan = get_pointcloud_to_scan(spec.num_bins)
    to_grid = get_scan_to_grid(spec)

    def loop(pts):
        def body(p, _):
            g = to_grid(
                to_scan(
                    p, jnp.float32(10.0), jnp.float32(-1.0),
                    jnp.float32(1.0),
                )
            )
            occ = jnp.sum(g).astype(jnp.float32)
            return p + (1e-9 * occ + 1e-7), occ

        _, occs = lax.scan(body, pts, None, length=k)
        return occs[-1]

    return jax.jit(loop)


def _dwa_baseline_buffers(n_variants: int):
    """The runner's DWA_2025x30 workload as (spec, resident variants)."""
    import jax

    from .runner import BenchmarkRunner

    r = BenchmarkRunner()
    # reuse the exact workload builder so the program under test is the
    # same solve the slope suite times
    solver, variants = r._dwa_workload(45, 45, 30, 512, 384, "baseline")
    del solver
    need = n_variants - len(variants)
    if need > 0:
        base = np.asarray(jax.device_get(variants[0]))
        extra = []
        for k in range(need):
            v = base.copy()
            v[0] += 1e-3 + 1e-4 * k
            extra.append(jax.device_put(v))
        for v in extra:
            float(np.asarray(v[0]))
        variants = list(variants) + extra
    from ..ops.solver import SolverSpec, packed_input_size

    spec = SolverSpec(
        is_omni=False, n_vx=45, n_vy=1, n_omega=45, max_points=30,
        num_ctrl_points=6, scan_size=512, seg_size=384, drop_samples=True,
    )
    assert variants[0].shape == (packed_input_size(spec),), (
        "device-loop spec drifted from runner._dwa_workload"
    )
    return spec, variants


def _resident(bufs):
    """Force each buffer device-resident by fetching one scalar."""
    for v in bufs:
        float(np.asarray(v.ravel()[0]))
    return bufs


def main(repeats: int = 10):
    import jax

    from ..utils.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    n_var = 2 * repeats + 2
    results = []

    spec, variants = _dwa_baseline_buffers(n_var)
    # k-span 256: the published protocol for the DWA pair (CLAUDE.md /
    # DEVICE_LOOP.json k8_k264 entries) — the earlier (8, 72) span's
    # ~8 ms K-delta sat inside the tunnel jitter band on degraded days
    results.append(measure_device_loop(
        "DWA_2025x30_device_loop",
        lambda k: make_dwa_device_loop(spec, k),
        variants, ks=(8, 264), repeats=repeats,
    ))

    # moving-obstacle variant of the same workload: the tunnel-immune
    # cross-check for MOVING_BENCH.json's slope-measured +8.5%
    import dataclasses

    from ..ops.solver import packed_input_size as _pis

    mov_spec = dataclasses.replace(spec, moving_obstacles=True)
    rng_m = np.random.default_rng(5)
    mov_variants = []
    for v in variants:
        b = np.asarray(jax.device_get(v))
        mb = np.zeros(_pis(mov_spec), np.float32)
        mb[: b.shape[0]] = b
        mb[b.shape[0] :] = rng_m.uniform(
            -1.5, 1.5, _pis(mov_spec) - b.shape[0]
        ).astype(np.float32)
        mov_variants.append(jax.device_put(mb))
    _resident(mov_variants)
    results.append(measure_device_loop(
        "DWA_2025x30_moving_device_loop",
        lambda k: make_dwa_device_loop(mov_spec, k),
        mov_variants, ks=(8, 264), repeats=repeats,
    ))

    from ..ops.critical_zone import build_critical_zone

    angles = np.arange(0.0, 2 * np.pi, 2 * np.pi / 3600)
    cz = build_critical_zone(
        "CYLINDER", [0.51, 1.0], (0, 0, 0), (0, 0, 0, 1),
        160.0, 0.3, 0.6, angles,
    )
    rng = np.random.default_rng(0)
    cz_variants = _resident([
        jax.device_put(rng.uniform(0.81, 1.11, 3600).astype(np.float32))
        for _ in range(n_var)
    ])
    # the dense-scan check is single-digit us of device work: the K-span
    # must put the K-delta well above tunnel timing jitter (a (8, 40)
    # span measured NEGATIVE estimates -- its 0.3 ms delta was inside the
    # jitter band; (16, 1024) still straddled zero)
    results.append(measure_device_loop(
        "CriticalZone_Dense_device_loop",
        lambda k: make_critical_zone_device_loop(cz, k),
        cz_variants, ks=(16, 8192), repeats=repeats,
    ))

    # 100k cloud: distinct variants built ON DEVICE (n_var x 1.2 MB host
    # uploads through the tunnel would dominate setup)
    n_cloud = 100_000
    r = rng.uniform(0.9, 9.9, n_cloud)
    a = rng.uniform(0, 2 * np.pi, n_cloud)
    cloud = np.stack(
        [r * np.cos(a), r * np.sin(a), rng.uniform(-0.4, 0.4, n_cloud)],
        axis=1,
    ).astype(np.float32)
    cloud_dev = jax.device_put(cloud)
    shift = jax.jit(lambda p, c: p + c)
    cloud_variants = _resident(
        [shift(cloud_dev, np.float32(1e-5 * k)) for k in range(n_var)]
    )
    results.append(measure_device_loop(
        "CriticalZone_100k_device_loop",
        lambda k: make_critical_zone_cloud_device_loop(cz, k),
        cloud_variants, ks=(8, 512), repeats=repeats,
    ))

    from ..ops.mapping import MapperSpec

    mspec = MapperSpec(
        grid_height=400, grid_width=400, num_bins=3600, resolution=0.05
    )
    m_variants = _resident([
        jax.device_put(rng.uniform(0.5, 9.9, 3600).astype(np.float32))
        for _ in range(n_var)
    ])
    results.append(measure_device_loop(
        "Mapper_Dense_device_loop",
        lambda k: make_mapper_device_loop(mspec, k),
        m_variants, ks=(8, 56), repeats=repeats,
    ))

    prev = np.full((400, 400), 0.5, np.float32)
    bay_variants = []
    for k in range(n_var):
        rr = jax.device_put(
            rng.uniform(0.5, 9.9, 3600).astype(np.float32)
        )
        pp = jax.device_put(prev + np.float32(1e-6 * k))
        float(np.asarray(rr[0])); float(np.asarray(pp[0, 0]))
        bay_variants.append((rr, pp))
    results.append(measure_device_loop(
        "Mapper_Bayesian_device_loop",
        lambda k: make_mapper_bayesian_device_loop(mspec, k),
        bay_variants, ks=(8, 56), repeats=repeats,
    ))

    pc_variants = _resident(
        [shift(cloud_dev, np.float32(2e-5 * k + 1e-6)) for k in range(n_var)]
    )
    results.append(measure_device_loop(
        "Mapper_PointCloud_device_loop",
        lambda k: make_mapper_pointcloud_device_loop(mspec, k),
        pc_variants, ks=(8, 40), repeats=repeats,
    ))

    artifact = {
        "method": (
            "K carry-chained solves inside ONE dispatch (data-dependent"
            " lax.scan), per-solve time from the K-delta of two single"
            " dispatches; cancels tunnel RTT and dispatch overhead"
            f" exactly. Median of {repeats} repeats, one distinct"
            " device-resident input per dispatch."
        ),
        "date": time.strftime("%Y-%m-%d"),
        "platform": str(jax.devices()[0]),
        "cross_check": (
            "slope-method medians (BENCH_LOCAL.json) agree within noise"
            " for every >0.5 ms workload; CriticalZone_Dense is the"
            " exception - its slope number (~0.157 ms) is the"
            " per-dispatch pipeline floor, while actual device compute"
            " is ~1.5 us. The device-loop number is authoritative for"
            " device compute; the slope number remains the honest"
            " per-dispatch service time through a host round-trip."
        ),
        "results": results,
    }
    print(json.dumps(artifact, indent=1))
    return results


if __name__ == "__main__":
    main()
