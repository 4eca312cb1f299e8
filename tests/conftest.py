"""Test configuration: force an 8-device CPU mesh before JAX loads.

Multi-device sharding tests run against virtual CPU devices (the
TPU-native analog of testing multi-node behavior without a cluster).
"""

import os

# Force-override: the environment may preset JAX_PLATFORMS=axon,cpu
# (real TPU via tunnel); tests must run on virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
