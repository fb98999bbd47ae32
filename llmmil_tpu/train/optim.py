"""Optimizer + LR schedule construction.

Parity targets: the reference's optimizer switch (``train_ddp.py:103-117``:
SGD lr=1e-3 wd=1e-7 when learnablePrompt, else Adam(b1,b2) wd=1e-7 with lr
forced to 1e-3 for >2 classes / 1e-5 otherwise), the step/cosine LR schedule
(``utils.py:232-241``), and extractor freezing (``train_ddp.py:154-185``) —
expressed TPU-natively as an optax chain with a multi_transform freeze mask
(frozen subtrees get ``set_to_zero`` instead of mutated ``requires_grad``).
"""

from __future__ import annotations

import math
from typing import Iterable

import jax
import jax.numpy as jnp
import optax

from ..config import Config


def effective_lr(cfg: Config) -> float:
    """Runtime lr override rules (train_ddp.py:104-114).  Note: like the
    reference, the learnablePrompt branch fires regardless of model_CI —
    the flag defaults to 1, so default runs get SGD lr=1e-3."""
    if cfg.learnablePrompt:
        return 1e-3
    return 1e-3 if cfg.num_classes > 2 else 1e-5


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """Epoch-granular schedule: cosine over n_epochs when ``cos`` else ×0.1
    at each milestone in ``schedule`` (utils.py:232-241)."""
    base = effective_lr(cfg)

    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        if cfg.cos:
            return base * 0.5 * (1.0 + jnp.cos(
                jnp.pi * epoch / max(cfg.n_epochs, 1)))
        factor = jnp.asarray(1.0)
        for milestone in cfg.schedule:
            factor = factor * jnp.where(epoch >= milestone, 0.1, 1.0)
        return base * factor

    return sched


def freeze_label_tree(params, frozen_prefixes: Iterable[str]):
    """Label each leaf 'frozen' if its path starts with a frozen module name
    (the reference's requires_grad=False on extractor subtrees,
    train_ddp.py:160-185)."""
    frozen = tuple(frozen_prefixes)

    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "frozen" if top in frozen else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def frozen_prefixes_from_config(cfg: Config) -> list[str]:
    out = []
    if cfg.pretrainedExt_freeze:
        if cfg.pretrainedExt_CT and "CT" in cfg.modality:
            out.append("extractor_CT")
        if cfg.pretrainedExt_pathology and "pathology" in cfg.modality:
            out.append("extractor_pathology")
        if cfg.pretrainedExt_CI and "CI" in cfg.modality:
            out.append("clinic_extractor")
    return out


def make_optimizer(cfg: Config, params=None, steps_per_epoch: int = 100
                   ) -> optax.GradientTransformation:
    """``steps_per_epoch`` counts gradient APPLICATIONS (micro-batches ×
    echoes); with ``cfg.grad_accum`` > 1 the inner transform only steps
    once per ``grad_accum`` applications, so the schedule horizon is
    divided accordingly."""
    accum = max(int(getattr(cfg, "grad_accum", 1)), 1)
    sched = make_lr_schedule(cfg, max(steps_per_epoch // accum, 1))
    wd = 1e-7
    if cfg.learnablePrompt:
        inner = optax.chain(optax.add_decayed_weights(wd),
                            optax.sgd(learning_rate=sched))
    else:
        inner = optax.chain(optax.add_decayed_weights(wd),
                            optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2),
                            optax.scale_by_learning_rate(sched))
    frozen = frozen_prefixes_from_config(cfg)
    if frozen and params is not None:
        labels = freeze_label_tree(params, frozen)
        inner = optax.multi_transform(
            {"train": inner, "frozen": optax.set_to_zero()}, labels)
    if accum > 1:
        # average grads over accum micro-batches, update on the last —
        # for mean-per-sample losses this equals one step on the
        # concatenated batch, up to dropout noise (each micro-batch draws
        # its own mask via the step counter).  Tested in tests/test_accum.py
        inner = optax.MultiSteps(inner, every_k_schedule=accum)
    return inner
