"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; unit and
integration tests run everywhere (CI included) on the CPU backend with 8
virtual devices so multi-chip sharding is testable without hardware —
the same trick the reference uses to test SYCL "GPU" code on CPU runners
(reference ``.github/workflows/test_gpgpu_install.yml:31-41``).

Note: the environment's sitecustomize may pin ``jax_platforms`` to a remote
TPU backend via jax.config (overriding env vars), so we must override the
config value itself after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
