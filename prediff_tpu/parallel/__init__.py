from .mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
    replicate,
    local_batch_slice,
)
