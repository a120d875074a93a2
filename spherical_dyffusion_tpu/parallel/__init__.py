from .mesh import batch_sharding, make_mesh, replicated, shard_batch, P
from .multihost import MultihostSpec, maybe_init_multihost, parse_multihost_env

__all__ = [
    "batch_sharding", "make_mesh", "replicated", "shard_batch", "P",
    "MultihostSpec", "maybe_init_multihost", "parse_multihost_env",
]
