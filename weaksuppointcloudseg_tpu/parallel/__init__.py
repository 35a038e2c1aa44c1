from weaksuppointcloudseg_tpu.parallel.mesh import (
    make_mesh,
    cached_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "cached_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "replicated_sharding",
]
