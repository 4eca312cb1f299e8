"""Test configuration: force an 8-device CPU mesh before JAX backend init.

Multi-device sharding tests run against virtual CPU devices (the
TPU-native analog of testing multi-node behavior without a cluster).

NOTE: the environment may pre-import jax at interpreter startup (axon
sitecustomize) with JAX_PLATFORMS=axon (real TPU via tunnel), so env-var
overrides are too late -- we must go through jax.config.update, which
works any time before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
