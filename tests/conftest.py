"""Test harness: force an 8-device virtual CPU mesh before jax device init.

Multi-device semantics (DP sharding, sync-BN statistics) are tested on
virtual CPU devices — the equivalent of the reference's "debug mode on real
GPUs" integration testing (SURVEY.md §4), but runnable anywhere.

Note: the env may preset JAX_PLATFORMS to a hardware plugin (e.g. a tunneled
TPU) that ignores the env override, so we force the platform through
jax.config as well.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
