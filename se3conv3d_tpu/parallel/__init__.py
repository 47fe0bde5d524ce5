from .mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
    shard_batch,
)
