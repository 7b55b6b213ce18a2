"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the real TPU is a single chip; multi-chip is validated on a fake
mesh, mirroring the driver's dryrun_multichip contract)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon site config can force the TPU platform regardless of the env var;
# the config update below wins as long as it runs before backend init.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache: the suite jit-compiles ~100 programs; a warm
# cache cuts a cold-container run from ~20 min to a few minutes.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/vloam_jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(16833)
