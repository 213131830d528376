from .mesh import get_mesh, batch_sharding, replicated, shard_batch

__all__ = ["get_mesh", "batch_sharding", "replicated", "shard_batch"]
