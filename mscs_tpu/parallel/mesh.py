"""Device mesh + sharding helpers — the DP runtime.

TPU-native replacement for the reference's DDP wiring
(``managers/BaseManager.py:106-145``: mp.spawn + NCCL process group +
DistributedDataParallel).  Here one process drives all local devices: a 1-D
``data`` mesh, batch arrays sharded on their leading axis, parameters
replicated.  Gradient all-reduce, sync-BN statistics and metric reduction all
fall out of compiling the train step with these shardings — XLA inserts the
ICI collectives (the scaling-book recipe: pick a mesh, annotate shardings,
let the compiler place psums).

Multi-host: call ``initialize_distributed()`` first (jax.distributed over
DCN), then the same mesh spans all hosts via ``jax.devices()``.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host rendezvous (replaces dist.init_process_group, ref :132-134)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _place(x, sh: NamedSharding):
    """Single-host: device_put.  Multi-host: the local array is this
    process's shard of the global batch (the loaders shard indices per
    host), so assemble a global jax.Array from process-local data —
    device_put cannot address other hosts' devices."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with sharded leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _place(x, sh), batch)


def shard_grouped_batch(mesh: Mesh, batch):
    """Place a (steps, batch, ...) pytree: axis 0 is a ``lax.scan`` step axis
    (train.steps_per_call), axis 1 is the device-sharded batch axis."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree.map(lambda x: _place(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: _place(x, sh), tree)
