"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the SURVEY §4 recommendation: multi-device semantics are validated
on CPU-backed virtual devices (strictly better than the reference's
GPU-gated mp.spawn tests).
"""

import os

# Force CPU for tests even when the session environment points JAX at a
# remote TPU (JAX_PLATFORMS=axon): unit tests run on an 8-device virtual
# CPU mesh; only bench.py targets the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU backend at
# interpreter start and overrides JAX_PLATFORMS; the config update below is
# what actually pins tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap compiled-executable accumulation across the full suite.

    A single `pytest tests/` process compiles thousands of XLA CPU
    executables; past ~400 tests the CPU client has segfaulted inside
    backend_compile_and_load (observed twice at the same suite position,
    while the same tests pass in a fresh process). Dropping the jit caches
    at module boundaries keeps the live-executable population bounded; each
    module recompiles its own programs anyway."""
    yield
    jax.clear_caches()
