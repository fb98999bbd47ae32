"""Train state: params + optimizer + BatchNorm running stats."""

from __future__ import annotations

from typing import Any

import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, cfg, batch, rng, optimizer=None,
                       steps_per_epoch: int = 100,
                       jit_init: bool = False) -> TrainState:
    """``jit_init``: compile ``model.init`` as one XLA program instead of
    dispatching it op by op.  Eager init of the flagship is ~38 s of
    per-op dispatch on a 1-core host (and one ~30 ms host<->device round
    trip PER OP through the axon tunnel); the jitted graph costs about the
    same once, then hits jax's persistent compile cache.  Off by default:
    tiny test models init faster eagerly than they trace."""
    from .optim import make_optimizer

    if jit_init:
        variables = jax.jit(
            lambda r, b: model.init(r, b, train=False))(rng, batch)
    else:
        variables = model.init(rng, batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optimizer or make_optimizer(cfg, params, steps_per_epoch)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                             batch_stats=batch_stats)
