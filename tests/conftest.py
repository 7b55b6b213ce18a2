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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(16833)
