"""One-off instrumentation: where does Mapper_Dense's time go?

Splits the update into (a) the candidate lookup (one-hot x tables MXU
dot) alone and (b) the full scan_to_grid, slope-timed with distinct
device-resident variants under the strict one-variant-per-dispatch
protocol. The difference bounds what a faster lookup could save —
measured BEFORE investing in a banded-lookup redesign.

Run on the real TPU: python -m kompass_core_tpu.benchmark.mapper_split
"""

import json

import numpy as np


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
    main()
