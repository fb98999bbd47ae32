"""Epoch-reshuffled sharded index sampler.

Parity target: torch ``DistributedSampler(shuffle=True)`` + ``set_epoch``
(``train_ddp.py:190-201``): a deterministic permutation seeded per epoch,
padded to a multiple of the world size, each process taking a strided slice.
Here the "world" is hosts (chips inside one host see the whole host batch via
sharding), so the sampler shards across ``jax.process_count()`` by default.
"""

from __future__ import annotations

import numpy as np


class ShardedEpochSampler:
    def __init__(self, n_samples: int, num_shards: int | None = None,
                 shard_id: int | None = None, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False):
        import jax
        self.n = n_samples
        self.num_shards = (num_shards if num_shards is not None
                           else jax.process_count())
        self.shard_id = (shard_id if shard_id is not None
                         else jax.process_index())
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.num_shards
        return -(-self.n // self.num_shards)

    def indices(self) -> np.ndarray:
        order = np.arange(self.n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        if self.drop_last:
            total = (self.n // self.num_shards) * self.num_shards
            order = order[:total]
        else:
            total = len(self) * self.num_shards
            pad = total - self.n
            if pad:
                order = np.concatenate([order, order[:pad]])
        return order[self.shard_id::self.num_shards]

    def __iter__(self):
        return iter(self.indices())
