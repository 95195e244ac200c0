"""One-off instrumentation: where does Mapper_Dense's time go?

Splits the update into (a) the candidate lookup (one-hot x tables MXU
dot) alone and (b) the full scan_to_grid, slope-timed with distinct
device-resident variants under the strict one-variant-per-dispatch
protocol. The difference bounds what a faster lookup could save —
measured BEFORE investing in a banded-lookup redesign.

Run on the real TPU: python -m kompass_core_tpu.benchmark.mapper_split
Add ``--modes`` to reproduce the lookup shoot-out (full vs banded-XLA vs
banded-Pallas, one fresh jit per mode with a shared-input checksum) —
the 2026-08-19 result: full 0.763/0.779 ms, banded 0.796 (w512) / 2.084
(w384), pallas 1.277; recorded in ROOFLINE.json and ops/mapping.py.
Measure the control in the SAME session (tunnel speed varies intra-day).
"""

import json

import numpy as np


def shootout():
    """full vs banded vs pallas lookup, slope-timed, checksum-verified."""
    import os
    from functools import partial

    import jax

    from ..ops.mapping import MapperSpec, scan_to_grid
    from ..utils.runtime import enable_persistent_compilation_cache
    from .runner import measure_throughput_slope, slope_variants_needed

    enable_persistent_compilation_cache()
    spec = MapperSpec(
        grid_height=400, grid_width=400, num_bins=3600, resolution=0.05
    )
    rng = np.random.default_rng(0)
    out, ref = {}, None
    # the lookup mode is process-global config: save/restore it so code
    # running after the shoot-out (e.g. the runner suite in the same
    # process) traces the DEFAULT whole-grid dot, not the last mode
    _saved = {k: os.environ.get(k)
              for k in ("KOMPASS_TPU_LOOKUP", "KOMPASS_TPU_BAND_WIN")}
    try:
        for name, env in (
            ("full", {"KOMPASS_TPU_LOOKUP": "full"}),
            ("banded_w512", {"KOMPASS_TPU_LOOKUP": "banded",
                             "KOMPASS_TPU_BAND_WIN": "512"}),
            ("pallas_w512", {"KOMPASS_TPU_LOOKUP": "pallas",
                             "KOMPASS_TPU_BAND_WIN": "512"}),
        ):
            os.environ.update(env)
            fn = jax.jit(partial(scan_to_grid, spec))  # fresh trace per mode
            variants = [
                jax.device_put(
                    rng.uniform(0.5, 9.5, 3600).astype(np.float32)
                )
                for _ in range(slope_variants_needed())
            ]
            for v in variants:
                float(np.asarray(v[0]))
            probe = np.asarray(fn(variants[0]))
            if ref is None:
                ref = (np.asarray(variants[0]), probe)
            else:
                assert np.array_equal(
                    np.asarray(fn(jax.device_put(ref[0]))), ref[1]
                ), f"{name} output differs from full"
            r = measure_throughput_slope(
                name, fn, variants, lambda o: int(np.asarray(o)[0, 0])
            )
            out[name] = r["mean_ms"]
            print(name, round(r["mean_ms"], 4), "ms", flush=True)
    finally:
        for k, v in _saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    print(json.dumps(out))
    return out


def main():
    import jax
    import jax.numpy as jnp

    from ..ops.mapping import (
        MapperSpec,
        _base_bin,
        _candidate_lookup,
        _cell_geometry,
        _sanitize_beams,
        get_scan_to_grid,
    )
    from .runner import measure_throughput_slope, slope_variants_needed

    spec = MapperSpec(
        grid_height=400, grid_width=400, num_bins=3600, resolution=0.05
    )
    rng = np.random.default_rng(0)
    n_var = slope_variants_needed()
    variants = [
        jax.device_put(rng.uniform(0.5, 9.5, 3600).astype(np.float32))
        for _ in range(n_var * 2)
    ]
    for v in variants:
        float(np.asarray(v[0]))

    def lookup_only(ranges):
        ranges, beam_valid = _sanitize_beams(ranges)
        _di, _dj, _d, theta = _cell_geometry(spec)
        base = _base_bin(spec, theta, 0.0)
        e_i_c, e_j_c, r_c, v_c = _candidate_lookup(
            spec, base, ranges, 0.0, valid=beam_valid
        )
        # reduce on device so the fetch is one scalar
        return (
            jnp.sum(e_i_c) + jnp.sum(e_j_c) + jnp.sum(r_c)
            + jnp.sum(v_c.astype(jnp.int32))
        )

    f_lookup = jax.jit(lookup_only)
    f_full = get_scan_to_grid(spec)

    it = iter(variants)
    res_lookup = measure_throughput_slope(
        "Mapper_lookup_only", f_lookup,
        [next(it) for _ in range(n_var)], lambda o: int(o),
    )
    res_full = measure_throughput_slope(
        "Mapper_full_update", lambda r: f_full(r),
        [next(it) for _ in range(n_var)],
        lambda o: int(np.asarray(o)[0, 0]),
    )
    out = {
        "lookup_only_ms": res_lookup["mean_ms"],
        "full_update_ms": res_full["mean_ms"],
        "rest_ms": res_full["mean_ms"] - res_lookup["mean_ms"],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import sys

    shootout() if "--modes" in sys.argv else main()
