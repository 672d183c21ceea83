from .mesh import (
    make_mesh,
    make_data_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
    replicate,
    local_batch_slice,
)
