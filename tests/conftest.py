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

# NOTE: do NOT enable the persistent XLA compile cache for CPU tests.
# XLA:CPU AOT cache entries embed compile-time machine-feature
# pseudo-flags (+prefer-no-scatter/+prefer-no-gather) that mismatch the
# host feature probe on reload; poisoned entries then surface as
# "Buffer Definition Event: Function copy_gather_fusion not found"
# crashes and hung workers (observed 2026-08-17 on this rig). The fast
# tier stays ~1 min cold without it.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Tier map: modules whose tests are quick on CPU (no full-model
# compiles). Everything else is marked slow; `pytest -m fast` gives a
# <2-minute green/red signal, `-m "not slow"` is equivalent.
_FAST_MODULES = {
    "test_text", "test_phonemizer", "test_config", "test_durations",
    "test_segment",
    "test_utils", "test_evaluation", "test_loss", "test_mel",
    "test_pitch", "test_audio", "test_modules", "test_checkpoint",
    "test_bucket_policy",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        module = module.removesuffix(".py")
        if module in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)
        else:
            item.add_marker(pytest.mark.slow)
        if "mesh" in module or "mesh" in item.name \
                or "multidevice" in item.name or "multichip" in item.name:
            item.add_marker(pytest.mark.mesh)


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
