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


def probe_backend(timeout_s: float = 240.0):
    """Initialize the JAX backend from a watchdog thread.

    The remote-tunnel backend can block indefinitely inside init when the
    tunnel is down; probing from a daemon thread lets callers fail fast.
    Returns the device list, or None when init raised or did not return
    within ``timeout_s``.
    """
    import threading

    result = {}

    def _probe():
        try:
            import jax

            result["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report, don't hang
            result["error"] = repr(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in result:
        return result["devices"]
    probe_backend.last_error = result.get(
        "error", f"backend init did not return within {timeout_s:.0f}s"
    )
    return None
