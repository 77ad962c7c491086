"""Collective / process helpers mirroring reference ``utils/distributed.py``.

Two layers:

- **axis-context helpers** (``reduce_tensor``, ``concat_all_gather``): direct
  ports of the reference functions, usable inside a ``shard_map``/``pmap``
  body where the ``data`` axis is bound — the same contract as the reference
  (callable only under dist.init_process_group).
- **mesh-level helpers** (``mesh_reduce_mean``, ``mesh_all_gather``): run the
  collective from regular runtime code by wrapping it in a ``shard_map`` over
  the given mesh.  These are what the Trainer-level runtime calls; the
  equivalent of calling the reference helpers from a manager.

Most reference call sites disappear in this design because jit-over-mesh
inserts reductions implicitly; the loss-level anchor gathering the reference
hooks but never enables (``losses/DenseContrastiveLossV2_ms.py:3``) maps to
``DenseContrastiveLossV2_ms(anchor_groups=...)`` — see losses/dense_contrastive.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mscs_tpu.parallel.mesh import DATA_AXIS


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


# ---------------------------------------------------------------- axis level
def reduce_tensor(value, world_size: int | None = None,
                  axis_name: str = DATA_AXIS):
    """Mean across the data axis (ref reduce_tensor).  Must be called where
    ``axis_name`` is bound (inside shard_map/pmap); use ``mesh_reduce_mean``
    from regular runtime code."""
    return jax.lax.pmean(value, axis_name)


def concat_all_gather(value, axis_name: str = DATA_AXIS):
    """All-gather along the data axis, no gradient (ref concat_all_gather,
    utils/distributed.py:50-60).  Must be called where ``axis_name`` is
    bound; use ``mesh_all_gather`` from regular runtime code."""
    return jax.lax.stop_gradient(
        jax.lax.all_gather(value, axis_name, tiled=True))


# ---------------------------------------------------------------- mesh level
def mesh_reduce_mean(mesh: Mesh, tree):
    """Mean of per-shard values over the mesh's data axis, callable from
    regular (non-shard_map) code.  Input leaves are sharded on their leading
    axis; the result is the replicated global mean."""
    def body(t):
        return jax.tree.map(lambda x: reduce_tensor(jnp.mean(x, axis=0)), t)

    fn = shard_map(body, mesh=mesh, in_specs=P(DATA_AXIS),
                   out_specs=P())
    return fn(tree)


def mesh_all_gather(mesh: Mesh, array):
    """Gather a leading-axis-sharded array to its full (replicated) form —
    the runtime-callable concat_all_gather."""
    def body(x):
        return concat_all_gather(x)

    # all_gather output is replicated by construction, but shard_map cannot
    # infer that statically -> disable the value-replication check (check_vma)
    fn = shard_map(body, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
                   check_vma=False)
    return fn(array)
