from .mesh import batch_sharding, make_mesh, replicated, shard_batch, P

__all__ = ["batch_sharding", "make_mesh", "replicated", "shard_batch", "P"]
