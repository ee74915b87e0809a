from .mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    replicate_state,
    prefetch_to_device,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate_state",
    "prefetch_to_device",
]
