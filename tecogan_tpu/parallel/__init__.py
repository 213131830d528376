from .mesh import (
    get_mesh, get_sp_mesh, batch_sharding, maybe_init_distributed,
    put_global, replicated, shard_batch)

__all__ = ["get_mesh", "get_sp_mesh", "batch_sharding", "put_global",
           "maybe_init_distributed", "replicated", "shard_batch"]
