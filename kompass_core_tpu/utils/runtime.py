"""Runtime setup helpers: persistent compilation cache.

The reference pays SYCL JIT cost once per process via a construction-time
warmup (``dwa.cpp:75-91``); the TPU-native equivalent is XLA's persistent
compilation cache, which amortizes compiles across *processes* — the first
construction ever compiles, every later run (tests, benchmarks, production
restarts) deserializes in ~100 ms.
"""

import logging
import os

logger = logging.getLogger("kompass_core_tpu")

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


def require_backend_or_cpu(timeout_s: float = 240.0):
    """Demo/tool helper: make SOME jax backend usable in this process.

    Probes the configured backend in a SUBPROCESS (a hung tunnel init
    holds jax's backend lock forever — isolating the probe keeps this
    process's jax untouched), and re-pins this process to CPU before its
    first backend init when the probe fails or times out. Must be called
    before any other jax use in the process. Returns the device list."""
    import subprocess
    import sys

    if os.environ.get("KOMPASS_TPU_FORCE_CPU"):
        # explicit opt-out (demos/CI on machines where the remote
        # accelerator is up but slow): skip the probe, pin CPU now —
        # env vars alone cannot re-pin after a sitecustomize, so this
        # must happen via config.update before the first backend init
        import jax

        jax.config.update("jax_platforms", "cpu")
        return jax.devices()

    # the probe must exercise a COMPILE, not just backend init: the
    # remote tunnel has been observed in a state where jax.devices()
    # answers in seconds but fresh compiles never complete (2026-08-20,
    # CLAUDE.md) — a devices-only probe would green-light a process that
    # then hangs for minutes on its first jit
    probe_code = (
        "import jax, jax.numpy as jnp;"
        "jax.devices();"
        "print(float(jax.jit(lambda x: (x + 1.0).sum())(jnp.zeros(8))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe_code],
            timeout=timeout_s,
            capture_output=True,
        )
        ok = r.returncode == 0
        err = "" if ok else (r.stderr or b"").decode(errors="replace")[-300:]
    except subprocess.TimeoutExpired:
        ok = False
        err = f"backend init did not return within {timeout_s:.0f}s"
    import jax

    if not ok:
        # env vars cannot re-pin after the sitecustomize; config.update can
        jax.config.update("jax_platforms", "cpu")
        logger.warning(
            "configured backend unreachable (%s); running on CPU", err
        )
    return jax.devices()
