from .mesh import (make_mesh, shard_batch, replicate, batch_sharding,
                   replicated_sharding)
from .sampler import ShardedEpochSampler
from .sp_mil import (sharded_mil_pool, shard_bag,
                     instance_sharded_apply)
from .sp_ct import depth_sharded_ct, shard_volume
from .multihost import initialize_from_args, is_primary, global_device_mesh
from .prefetch import prefetch_to_device
from .fsdp import fsdp_shardings, fsdp_spec, shard_state
from .tp import tp_shardings, tp_spec, shard_state_tp, DEFAULT_TP_RULES
from .ep import ep_shardings, shard_state_ep, EP_RULES
from .pp import gpipe_blocks, clip_blocks_pipeline

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding",
           "replicated_sharding", "ShardedEpochSampler",
           "sharded_mil_pool", "shard_bag", "instance_sharded_apply",
           "depth_sharded_ct",
           "shard_volume", "initialize_from_args", "is_primary",
           "global_device_mesh", "prefetch_to_device",
           "fsdp_shardings", "fsdp_spec", "shard_state",
           "tp_shardings", "tp_spec", "shard_state_tp",
           "DEFAULT_TP_RULES", "ep_shardings", "shard_state_ep",
           "EP_RULES", "gpipe_blocks", "clip_blocks_pipeline"]
