from .mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    replicate_state,
    prefetch_to_device,
    initialize_multihost,
    make_multihost_mesh,
    local_batch_slice,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate_state",
    "prefetch_to_device",
    "initialize_multihost",
    "make_multihost_mesh",
    "local_batch_slice",
]
