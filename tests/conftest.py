"""Test configuration: run everything on CPU with x64 and a virtual 8-device mesh.

The ambient environment pins JAX_PLATFORMS=axon (single tunneled TPU chip) and a
sitecustomize pre-imports jax, so env vars alone are ineffective here; we
override through jax.config before any backend is initialized.  Multi-chip
sharding is validated on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count) since only one real chip exists.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the jitted solver is one large program per
# (problem structure, options) pair; caching across pytest runs cuts the
# dev cycle from minutes to seconds.  IPOPT_TPU_NO_CACHE=1 disables it
# (the jaxlib in this image occasionally SIGABRTs deserializing an entry
# it wrote earlier in the same process — use for clean validation runs).
if not os.environ.get("IPOPT_TPU_NO_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", jax.default_backend()


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free in-memory compiled executables after each test module.  The full
    suite compiles dozens of large solver programs; without this the
    accumulated executables can OOM the host (the persistent on-disk cache
    makes reloads cheap)."""
    yield
    jax.clear_caches()
