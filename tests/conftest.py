"""Test configuration: run on CPU with 8 virtual devices and fp64.

This is the TPU answer to "test multi-node without a cluster" (SURVEY §4):
sharding/collective tests run on a virtual CPU mesh; numerics tests run in
fp64 for tight tolerances.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms to the TPU backend; override it
# AFTER import (env vars alone are ignored once the plugin registered)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: repeated test runs skip XLA recompiles
# (backend-specific dir: entries from TPU-attached processes carry CPU
# machine-feature flags that mis-load elsewhere)
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_tests_{jax.default_backend()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Free compiled executables between test modules: every loaded XLA
    CPU executable holds JIT code mappings, and a full-suite process
    accumulates enough to exhaust vm.max_map_count (default 65530) —
    observed as a segfault inside compile/cache-load ~45 tests in. The
    persistent disk cache makes the re-loads cheap."""
    yield
    jax.clear_caches()
