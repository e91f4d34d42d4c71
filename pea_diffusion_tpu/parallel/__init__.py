from .mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    batch_sharding,
    fsdp_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
from .distributed import initialize

__all__ = ["DATA_AXIS", "FSDP_AXIS", "batch_sharding", "fsdp_sharding",
           "make_mesh", "replicated", "shard_batch", "shard_params",
           "initialize"]
