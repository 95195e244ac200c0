"""Runtime setup helpers: persistent compilation cache.

The reference pays SYCL JIT cost once per process via a construction-time
warmup (``dwa.cpp:75-91``); the TPU-native equivalent is XLA's persistent
compilation cache, which amortizes compiles across *processes* — the first
construction ever compiles, every later run (tests, benchmarks, production
restarts) deserializes in ~100 ms.
"""

import os

_cache_enabled = False


def enable_persistent_compilation_cache(path: str = None) -> None:
    """Idempotently point JAX at an on-disk compilation cache.

    Disable with KOMPASS_TPU_NO_CACHE=1 (e.g. when measuring cold-compile
    time).
    """
    global _cache_enabled
    if _cache_enabled or os.environ.get("KOMPASS_TPU_NO_CACHE"):
        return
    import jax

    path = path or os.path.expanduser("~/.cache/kompass_core_tpu/jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:  # cache is an optimization; never fail the caller
        pass
