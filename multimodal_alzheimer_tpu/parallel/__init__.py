from multimodal_alzheimer_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    replicate,
    shard_batch,
)

__all__ = ["DATA_AXIS", "make_mesh", "batch_sharding",
           "replicated_sharding", "replicate", "shard_batch"]
