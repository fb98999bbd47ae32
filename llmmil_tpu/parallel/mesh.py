"""Device mesh + data-parallel sharding helpers.

TPU-native replacement for the reference's DDP stack (``train_ddp.py:53-88``:
mp.spawn one process per GPU, NCCL process group, DistributedDataParallel
gradient all-reduce).  Here a single process sees all local chips through a
``jax.sharding.Mesh``; the batch is sharded over the 'data' axis, parameters
are replicated, and XLA inserts the gradient all-reduce over ICI when the
jitted train step runs — no explicit collectives in user code, exactly as DDP
hides NCCL inside backward.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts (DCN collectives handled by XLA).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Sequence[int] = (-1,),
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh; a -1 dim absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    known = int(np.prod([s for s in shape if s != -1])) or 1
    shape = [len(devices) // known if s == -1 else s for s in shape]
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every array in a batch pytree along its leading dim (the
    per-host equivalent of DistributedSampler's per-rank split,
    train_ddp.py:190-196).

    A remainder batch whose leading dim the 'data' axis can't divide (the
    last batch of an epoch with drop_last off) is placed replicated
    instead — every device computes the full small batch redundantly,
    which keeps numerics exact (the reference's DistributedSampler instead
    *duplicates samples* to even out ranks, which perturbs epoch metrics).
    """
    leaves = jax.tree_util.tree_leaves(batch)
    n = mesh.shape[axis]
    divisible = all(np.ndim(x) >= 1 and np.shape(x)[0] % n == 0
                    for x in leaves)
    sh = batch_sharding(mesh, axis) if divisible else \
        replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
