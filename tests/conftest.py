"""Test harness: force an 8-device virtual CPU mesh before jax imports.

Multi-device semantics (DP sharding, sync-BN statistics) are tested on
virtual CPU devices — the equivalent of the reference's "debug mode on real
GPUs" integration testing (SURVEY.md §4), but runnable anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
