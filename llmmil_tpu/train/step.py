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


def make_train_step(cfg: Config, donate: bool = True, mesh=None,
                    state_shardings=None):
    """Returns step(state, batch, rng) -> (state, metrics).

    ``batch`` must contain 'label' (B, num_classes) one-hot targets alongside
    the model inputs.  Dropout/crop PRNG keys are folded in from ``rng`` and
    the step counter.

    ``state_shardings``: a pytree of NamedShardings matching the train
    state (from ``parallel.fsdp.shard_state``) — pins the step's input AND
    output state layout so FSDP-sharded params/opt-state stay sharded
    across steps and donation can reuse the buffers.  None (the default)
    leaves placement to the arrays' committed shardings (replicated DP).

    ``cfg.ct_shard_axis`` + ``mesh``: depth-sharded (context-parallel) CT
    training — the MC3 trunk runs inside a shard_map over the named mesh
    axis with halo-exchange depth convs (parallel/sp_ct.py's schedule) and
    BN stats pmean-synced over (data, depth); its features feed the rest of
    the model through the ``ct_features`` path.  Exact vs the DP-only step
    (tests/test_sp_ct.py).  The reference's DDP trains this trunk unsharded
    on one GPU per sample (train_ddp.py:79).
    """
    pp_apply = None
    if getattr(cfg, "pp_axis", ""):
        # pipeline-parallel CLIP text tower (parallel/pp.py): rebuild the
        # flagship with the resblock stack routed through the GPipe hook.
        # Param tree identical, so the state and checkpoints are untouched.
        if mesh is None or cfg.pp_axis not in mesh.axis_names:
            raise ValueError(
                f"pp_axis={cfg.pp_axis!r} needs a mesh with that axis "
                f"(got {None if mesh is None else mesh.axis_names})")
        from ..models import Aggregator, build_model
        from ..parallel.pp import clip_blocks_pipeline
        base = build_model(cfg)
        if cfg.model_CI != "CLIP" or not isinstance(base, Aggregator):
            raise ValueError("pp_axis pipelines the flagship's CLIP text "
                             "tower (model_CI='CLIP', family "
                             "'aggregator')")
        pp_dtype = (jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype
                    else jnp.float32)
        blocks_fn = clip_blocks_pipeline(
            cfg.clip_width, cfg.clip_heads, pp_dtype, mesh,
            axis=cfg.pp_axis, n_micro=cfg.pp_micro,
            batch_axis="data" if "data" in mesh.axis_names else None)
        pp_apply = base.clone(ci_blocks_fn=blocks_fn).apply

    tp_ax = getattr(cfg, "tp_axis", "")
    act_interceptor = None
    if tp_ax and mesh is not None and tp_ax in mesh.axis_names:
        # pin residual-stream activation layouts at transformer-block
        # boundaries — without this, GSPMD propagation picks conflicting
        # layouts and resolves them with involuntary full
        # rematerialization on every resblock (parallel/tp.py docstring)
        from ..parallel.tp import tp_activation_interceptor
        act_interceptor = tp_activation_interceptor(mesh, tp_ax)

    ct_axis = cfg.ct_shard_axis or None
    ct_trunk = None
    if ct_axis is not None:
        if mesh is None or ct_axis not in mesh.axis_names:
            raise ValueError(
                f"ct_shard_axis={ct_axis!r} needs a mesh with that axis "
                f"(got {None if mesh is None else mesh.axis_names})")
        if not cfg.model_CT.startswith("resnetMC3"):
            raise ValueError(
                "ct_shard_axis supports the MC3 trunks (stride-1 depth "
                f"axis), not model_CT={cfg.model_CT!r}")
        from jax.sharding import PartitionSpec as P
        from ..models.aggregator import make_ct_extractor
        dtype = (jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype
                 else jnp.float32)
        data_axis = "data" if "data" in mesh.axis_names else None
        ext = make_ct_extractor(cfg, dtype).clone(
            shard_axis=ct_axis,
            bn_axes=tuple(a for a in (data_axis, ct_axis) if a))
        vol_spec = P(data_axis, ct_axis)

        def ct_trunk(params, stats, x):
            sub = {"params": params["extractor_CT"]}
            if stats and "extractor_CT" in stats:
                sub["batch_stats"] = stats["extractor_CT"]

            def body(v, xl):
                return ext.apply(v, xl, train=True,
                                 mutable=["batch_stats"])

            feat, mut = jax.shard_map(
                body, mesh=mesh, in_specs=(P(), vol_spec),
                out_specs=(vol_spec, P()))(sub, x)
            return feat, mut["batch_stats"]

    def loss_fn(params, state, batch, rng):
        variables = {"params": params}
        has_bn = state.batch_stats is not None and \
            jax.tree_util.tree_leaves(state.batch_stats)
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "crops": jax.random.fold_in(rng, 1)}
        ext_stats = None
        if ct_trunk is not None and "input_CT" in batch \
                and "ct_features" not in batch:
            ct_in = batch["input_CT"]
            if "wMask" in cfg.model_CT and "mask_CT" in batch:
                ct_in = jnp.concatenate(
                    [ct_in, batch["mask_CT"].astype(ct_in.dtype)], axis=-1)
            feat, ext_stats = ct_trunk(
                params, variables.get("batch_stats"), ct_in)
            batch = dict(batch, ct_features=feat)
        mutable = ["batch_stats"] if has_bn else []
        if getattr(cfg, "moe_experts", 0):
            # MoE FFN blocks sow their Switch load-balance aux loss into
            # the 'moe' collection (models/moe.py)
            mutable = mutable + ["moe"]
        import contextlib
        import flax.linen as nn
        ctx = (nn.intercept_methods(act_interceptor)
               if act_interceptor is not None else contextlib.nullcontext())
        with ctx:
            out, mutated = (pp_apply or state.apply_fn)(
                variables, batch, train=True, rngs=rngs, mutable=mutable)
        if ext_stats is not None:
            bs = dict(mutated.get("batch_stats", {}))
            bs["extractor_CT"] = ext_stats
            mutated = dict(mutated, batch_stats=bs)
        terms = multihead_loss(out, batch["label"], cfg.loss_point,
                               cfg.loss, cfg.num_classes)
        loss = terms["loss"]
        if getattr(cfg, "moe_experts", 0) and "moe" in mutated:
            aux_leaves = jax.tree_util.tree_leaves(mutated["moe"])
            aux = sum(jnp.asarray(a, jnp.float32) for a in aux_leaves) \
                / max(len(aux_leaves), 1)           # mean over MoE layers
            terms = dict(terms, moe_aux=aux)
            loss = loss + cfg.moe_aux_weight * aux
            terms["loss"] = loss
        return loss, (terms, out, mutated)

    def step(state: TrainState, batch: Dict, rng) -> tuple:
        rng = jax.random.fold_in(rng, state.step)
        grads, (terms, out, mutated) = jax.grad(
            loss_fn, has_aux=True)(state.params, state, batch, rng)
        new_state = state.apply_gradients(grads=grads)
        if mutated and "batch_stats" in mutated:
            new_state = new_state.replace(
                batch_stats=mutated["batch_stats"])
        preds = jnp.argmax(out["probs"], axis=-1)
        labels = jnp.argmax(batch["label"], axis=-1)
        metrics = dict(terms)
        metrics["acc"] = jnp.mean((preds == labels).astype(jnp.float32))
        metrics["probs"] = out["probs"]
        return new_state, metrics

    from ..utils import compiler_options_from_cfg
    copts = compiler_options_from_cfg(cfg)
    donate_argnums = (0,) if donate else ()
    if state_shardings is not None:
        # FSDP: pin the state argument and the returned state to the same
        # sharded layout; batch/rng/metrics stay unconstrained (None)
        return jax.jit(step, donate_argnums=donate_argnums,
                       in_shardings=(state_shardings, None, None),
                       out_shardings=(state_shardings, None),
                       compiler_options=copts)
    return jax.jit(step, donate_argnums=donate_argnums,
                   compiler_options=copts)


def make_eval_step(cfg: Config, jit: bool = True):
    """no-grad mirror of the train step (train_ddp.py:382-513).

    ``jit=False`` returns the raw python step for composition INSIDE an
    outer ``jax.jit`` (e.g. the int8-serving wrappers): the jitted form
    carries ``cfg.xla_options`` as compiler_options, which jax only
    accepts on a TOP-LEVEL jit — nesting it raises."""

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

    if not jit:
        return step
    from ..utils import compiler_options_from_cfg
    return jax.jit(step, compiler_options=compiler_options_from_cfg(cfg))
