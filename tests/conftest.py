"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise real multi-device lowering without TPU hardware.

Note: `import pytest` already pulls in jax via a plugin, so env vars alone
are too late — use jax.config.update (legal until the backend initializes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
