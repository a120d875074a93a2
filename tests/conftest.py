"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Mirrors the multi-host test strategy recommended for TPU frameworks: tests
never require TPU hardware; shardings are validated on a virtual device mesh.
"""

import os

# override any pre-set platform (e.g. the axon TPU tunnel) — tests always run
# on a virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# If jax was already imported by a pytest plugin, the env var above is too late;
# the config update below works as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
