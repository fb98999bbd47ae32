"""FSDP-style parameter + optimizer-state sharding (ZeRO-3 equivalent).

Beyond the reference: its DDP replicates the full model and optimizer on
every GPU (``train_ddp.py:79`` — DistributedDataParallel holds a complete
parameter copy per rank, and Adam moments live per rank too), so per-device
memory never shrinks as devices are added.  Here the train state's large
leaves are sharded over a mesh axis with ``jax.sharding.NamedSharding`` and
XLA's SPMD partitioner inserts the collectives (all-gather before use,
reduce-scatter of gradients) — the idiomatic TPU form of FSDP: no wrapper
module, no manual bucketing, just sharding annotations on the state pytree.

Sharding rule per leaf: the LARGEST dimension divisible by the axis size is
sharded; leaves smaller than ``min_size`` elements (biases, scalars, BN
stats) stay replicated — their all-gather would cost more than the memory
saved.  The rule is a pure function of shapes, so params, Adam moments, the
``grad_accum`` accumulator, and BN stats all shard consistently.

Numerics: identical math to data parallelism — only the reduction schedule
changes (reduce-scatter + all-gather vs all-reduce), so results match DP to
float tolerance (pinned in tests/test_fsdp.py).

Single-host scope: checkpointing fetches sharded leaves with
``jax.device_get`` (assembles fully-addressable arrays); a multi-host FSDP
checkpoint would additionally need a cross-process gather.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape, axis_size: int, axis_name: str,
              min_size: int = 1024) -> P:
    """PartitionSpec for one leaf: shard the largest divisible dim."""
    shape = tuple(shape)
    if int(np.prod(shape, dtype=np.int64)) < min_size:
        return P()
    for d in sorted(range(len(shape)), key=lambda i: shape[i],
                    reverse=True):
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            spec = [None] * len(shape)
            spec[d] = axis_name
            return P(*spec)
    return P()


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = "data",
                   min_size: int = 1024) -> Any:
    """Pytree of NamedShardings matching ``tree`` leaf-for-leaf."""
    if axis not in mesh.axis_names:
        raise ValueError(f"fsdp axis {axis!r} not in mesh axes "
                         f"{mesh.axis_names}")
    n = mesh.shape[axis]

    def one(x):
        shape = np.shape(x)
        return NamedSharding(mesh, fsdp_spec(shape, n, axis, min_size))

    return jax.tree_util.tree_map(one, tree)


def shard_state(state: Any, mesh: Mesh, axis: str = "data",
                min_size: int = 1024) -> tuple[Any, Any]:
    """Place a train state with FSDP shardings.

    Returns ``(sharded_state, shardings)`` — the shardings pytree is passed
    to ``make_train_step(state_shardings=...)`` so the jitted step pins its
    output state to the same layout (donation then reuses the buffers).
    """
    shardings = fsdp_shardings(state, mesh, axis, min_size)
    placed = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings)
    return placed, shardings
