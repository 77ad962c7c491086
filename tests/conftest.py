"""Test harness: force an 8-device virtual CPU mesh before jax device init.

Multi-device semantics (DP sharding, sync-BN statistics) are tested on
virtual CPU devices — the equivalent of the reference's "debug mode on real
GPUs" integration testing (SURVEY.md §4), but runnable anywhere.

Note: the env may preset JAX_PLATFORMS to a hardware plugin (e.g. a tunneled
TPU) that ignores the env override, so we force the platform through
jax.config as well.

``MSCS_TPU_TESTS=1`` flips the harness to CHIP mode: the platform is left
alone (the real TPU) and only ``@pytest.mark.tpu`` tests run — the on-chip
smoke subset (tests/test_tpu_smoke.py; VERDICT r3 #6).  Without it, tpu-
marked tests are skipped and the virtual-CPU suite runs as before:

    python -m pytest tests/ -q                       # CPU suite (default)
    MSCS_TPU_TESTS=1 python -m pytest tests/ -m tpu  # on-chip smoke subset
"""
import os

# TB event emission is covered by test_logger_tb (which re-enables it); the
# dozens of Trainer e2e tests shouldn't each pay SummaryWriter setup.
os.environ.setdefault("MSCS_TB", "0")

TPU_MODE = os.environ.get("MSCS_TPU_TESTS") == "1"

if not TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="needs MSCS_TPU_TESTS=1 and a real TPU "
               "(MSCS_TPU_TESTS=1 python -m pytest -m tpu)")
    skip_cpu = pytest.mark.skip(
        reason="CPU-mesh test: run without MSCS_TPU_TESTS")
    for item in items:
        if "tpu" in item.keywords:
            if not TPU_MODE:
                item.add_marker(skip_tpu)
        elif TPU_MODE:
            # the rest of the suite assumes the 8-device virtual CPU mesh
            item.add_marker(skip_cpu)


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
