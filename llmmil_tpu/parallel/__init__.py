from .mesh import (make_mesh, shard_batch, replicate, batch_sharding,
                   replicated_sharding)
from .sampler import ShardedEpochSampler
from .sp_mil import sharded_mil_pool, shard_bag

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding",
           "replicated_sharding", "ShardedEpochSampler",
           "sharded_mil_pool", "shard_bag"]
