"""Train state: params + optimizer + BatchNorm running stats."""

from __future__ import annotations

from typing import Any

import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, cfg, batch, rng, optimizer=None,
                       steps_per_epoch: int = 100) -> TrainState:
    from .optim import make_optimizer

    variables = model.init(rng, batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optimizer or make_optimizer(cfg, params, steps_per_epoch)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                             batch_stats=batch_stats)
