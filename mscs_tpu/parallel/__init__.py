from mscs_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
    shard_grouped_batch,
)
from mscs_tpu.parallel import dist

__all__ = [
    "DATA_AXIS", "batch_sharding", "initialize_distributed", "make_mesh",
    "replicate", "replicated_sharding", "shard_batch", "shard_grouped_batch",
    "dist",
]
