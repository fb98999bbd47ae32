"""jit-compiled train / eval steps.

The whole per-batch loop body of the reference (``train_ddp.py:271-355``:
forward, multi-head loss, backward, optimizer step, metric accumulation)
compiles into ONE XLA program.  Data parallelism is expressed with sharding
annotations (see ``llmmil_tpu.parallel``): batch sharded over the 'data' mesh
axis, params replicated — XLA inserts the gradient all-reduce over ICI, the
TPU-native equivalent of DDP's NCCL bucket all-reduce (train_ddp.py:79).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import Config
from .losses import multihead_loss
from .state import TrainState


def make_train_step(cfg: Config, donate: bool = True):
    """Returns step(state, batch, rng) -> (state, metrics).

    ``batch`` must contain 'label' (B, num_classes) one-hot targets alongside
    the model inputs.  Dropout/crop PRNG keys are folded in from ``rng`` and
    the step counter.
    """

    def loss_fn(params, state, batch, rng):
        variables = {"params": params}
        has_bn = state.batch_stats is not None and \
            jax.tree_util.tree_leaves(state.batch_stats)
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "crops": jax.random.fold_in(rng, 1)}
        out, mutated = state.apply_fn(
            variables, batch, train=True,
            rngs=rngs, mutable=["batch_stats"] if has_bn else [])
        terms = multihead_loss(out, batch["label"], cfg.loss_point,
                               cfg.loss, cfg.num_classes)
        return terms["loss"], (terms, out, mutated)

    def step(state: TrainState, batch: Dict, rng) -> tuple:
        rng = jax.random.fold_in(rng, state.step)
        grads, (terms, out, mutated) = jax.grad(
            loss_fn, has_aux=True)(state.params, state, batch, rng)
        new_state = state.apply_gradients(grads=grads)
        if mutated:
            new_state = new_state.replace(
                batch_stats=mutated["batch_stats"])
        preds = jnp.argmax(out["probs"], axis=-1)
        labels = jnp.argmax(batch["label"], axis=-1)
        metrics = dict(terms)
        metrics["acc"] = jnp.mean((preds == labels).astype(jnp.float32))
        metrics["probs"] = out["probs"]
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: Config):
    """no-grad mirror of the train step (train_ddp.py:382-513)."""

    def step(state: TrainState, batch: Dict):
        variables = {"params": state.params}
        if state.batch_stats is not None and \
                jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        out = state.apply_fn(variables, batch, train=False)
        terms = multihead_loss(out, batch["label"], cfg.loss_point,
                               cfg.loss, cfg.num_classes)
        preds = jnp.argmax(out["probs"], axis=-1)
        labels = jnp.argmax(batch["label"], axis=-1)
        metrics = dict(terms)
        metrics["acc"] = jnp.mean((preds == labels).astype(jnp.float32))
        metrics["probs"] = out["probs"]
        return metrics

    return jax.jit(step)
