"""Test harness configuration.

All tests run on a simulated 8-device CPU mesh (the standard JAX trick for
testing sharded code without a TPU pod — SURVEY §4).  The axon sitecustomize
forces JAX_PLATFORMS=axon at interpreter startup, so we must override via
jax.config *before any computation runs* — config updates still win at
backend-selection time.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: test wall time is dominated by CPU jit
# compiles that are identical run to run (same programs, same shapes) —
# cache them next to the bench cache (gitignored, platform-keyed, safe
# to share the directory).  PIR_JAX_CACHE="" disables.
_cache_dir = os.environ.get(
    "PIR_JAX_CACHE",
    os.path.join(os.path.dirname(__file__), "..", "benchmarks", ".jax_cache"),
)
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
