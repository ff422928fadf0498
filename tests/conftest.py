"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU required) so that sharding
tests exercise real collectives and float64 oracle parity is available.

Note: this environment pre-imports jax at interpreter startup (sitecustomize)
with JAX_PLATFORMS=axon pointing at a remote TPU; setting env vars here is
too late, so we override through jax.config before any backend initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compile cache: the heavy receiver jits compile once per
# machine instead of once per pytest run.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdr_jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Golden-model parity tests compare against float64 scipy oracles; enable
# x64 so tests can opt into exact-parity dtypes.  Production path is float32.
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) >= 8, "need the 8-device virtual CPU mesh for sharding tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x3D44)
