#!/usr/bin/env python
"""Chained-in-jit train-step timing: device time without host dispatch.

The per-call harness (bench_train.py, bench_batch_sweep.py) dispatches one
jitted step per iteration; with ~10^3-leaf state pytrees on this 1-core
host each dispatch costs O(100 ms) of Python/RPC, which the marginal
timing then mis-attributes to the step itself (profile_nonct_attrib:
grad_train 59.6 ms but per-call step 216 ms).  Here K steps run inside ONE
jit via lax.scan (state threaded through the carry, same batch each step),
so the measurement is pure device time.

Usage: python scripts/bench_chained_step.py [--ct] [--k 16] [--small]
  --ct     full tri-modal flagship at production size (long compile)
  (default: pathology+CI non-CT config, bag 15616)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ct", action="store_true")
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--bag", type=int, default=15616)
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.bag, ns.k = 256, 2

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.train import create_train_state
    from llmmil_tpu.train.losses import multihead_loss

    kw = dict(model_pathology="TransMIL", model_CI="CLIP",
              CI_input_version="text", CI_prompt_version="devided",
              aggregator="TransMIL", compute_dtype="bfloat16",
              learnablePrompt=1, n_ctx=8, batch_size=1)
    if ns.ct:
        cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                     loss_point="CT-Pth-Last", loss="BCE+textCosSim",
                     spacing=[0.6869, 0.6869, 3.0], **kw)
        ct_shape = (8, 32, 32) if ns.small else (160, 512, 512)
    else:
        cfg = Config(modality=["pathology"], loss_point="Last",
                     loss="BCE", **kw)
        ct_shape = None
    if ns.small:
        cfg = cfg.replace(clip_vocab=64, clip_context=16, clip_width=32,
                          clip_heads=4, clip_layers=1, clip_embed=16)

    model = build_model(cfg)
    rs = np.random.RandomState(0)
    toks = rs.randint(1, cfg.clip_vocab - 2, (1, 10, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    batch = {
        "input_pathology": jnp.asarray(rs.randn(1, ns.bag, 768),
                                       jnp.float32),
        "mask_pathology": jnp.asarray(np.arange(ns.bag)[None] < ns.bag - 7),
        "input_CI": jnp.asarray(toks, jnp.int32),
        "label": jnp.asarray(np.eye(2)[[1]], jnp.float32),
    }
    if ct_shape is not None:
        batch["input_CT"] = jnp.asarray(rs.rand(1, *ct_shape, 1),
                                        jnp.float32)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    def one_step(state, rng_step):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None and \
                    jax.tree_util.tree_leaves(state.batch_stats):
                variables["batch_stats"] = state.batch_stats
            rngs = {"dropout": jax.random.fold_in(rng_step, 0),
                    "crops": jax.random.fold_in(rng_step, 1)}
            out, mutated = model.apply(
                variables, batch, train=True, rngs=rngs,
                mutable=["batch_stats"]
                if state.batch_stats is not None else [])
            terms = multihead_loss(out, batch["label"], cfg.loss_point,
                                   cfg.loss, cfg.num_classes)
            return terms["loss"], mutated
        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if mutated:
            state = state.replace(batch_stats=mutated["batch_stats"])
        return state, loss

    def chain(state, k):
        def body(carry, i):
            st, _ = carry
            st, loss = one_step(st, jax.random.fold_in(rng, i))
            return (st, loss), None
        (st, loss), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                     jnp.arange(k))
        return loss

    for k in (1, 1 + ns.k):
        t0 = time.perf_counter()
        comp = jax.jit(chain, static_argnums=1).lower(state, k).compile()
        cs = time.perf_counter() - t0
        float(comp(state))
        t = min(_t(comp, state) for _ in range(3))
        print(f"k={k}: {t * 1e3:.1f} ms total (compile {cs:.0f}s)",
              flush=True)
        if k == 1:
            t1 = t
        else:
            print(f"chained device step: {(t - t1) / ns.k * 1e3:.1f} ms",
                  flush=True)


def _t(comp, state):
    t0 = time.perf_counter()
    out = comp(state)
    float(out)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
