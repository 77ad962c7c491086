"""Collective / process helpers mirroring reference ``utils/distributed.py``.

The six reference helpers map onto jax primitives; most call sites disappear
because jit-over-mesh handles reduction implicitly, but the surface is kept
for API parity and for host-side coordination in multi-host runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_distributed() -> bool:
    """True when more than one device participates (ref is_distributed)."""
    return jax.device_count() > 1


def get_world_size() -> int:
    return jax.device_count()


def get_rank() -> int:
    """Host process index (ref get_rank; 0 in single-process runs)."""
    return jax.process_index()


def barrier() -> None:
    """Block until all hosts reach this point (ref barrier)."""
    if jax.process_count() > 1:
        # standard multi-host sync: tiny psum across all devices
        x = jnp.ones((jax.local_device_count(),))
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()


def all_reduce_numpy(array: np.ndarray) -> np.ndarray:
    """Sum a host array across processes (ref all_reduce_numpy)."""
    if jax.process_count() == 1:
        return array
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(array).sum(0))


def reduce_tensor(value, world_size: int | None = None):
    """Mean across the data axis — inside shard_map/pmap (ref reduce_tensor)."""
    return jax.lax.pmean(value, "data")


def concat_all_gather(value):
    """All-gather along the data axis — inside shard_map/pmap, no gradient
    (ref concat_all_gather, utils/distributed.py:50-60)."""
    return jax.lax.stop_gradient(
        jax.lax.all_gather(value, "data", tiled=True))
