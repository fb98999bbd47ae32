#!/usr/bin/env python
"""Attribute the non-CT train step (216 ms vs ~60 ms component sum).

Programs, all at the pathology+CI flagship production shape (bag 15,616,
batch 1, bf16):
  fwd         eval-mode loss forward
  grad_eval   jax.grad of the loss, train=False (no dropout)
  grad_train  jax.grad of the loss, train=True (dropout rng live)
  step        the full make_train_step (adds Adam + state update)
  tmil_mask   TransMIL component grad WITH a bag mask, train=False
  tmil_drop   TransMIL component grad, no mask, train=True (dropout)

Usage: python scripts/profile_nonct_attrib.py [--bag 15616] [--iters 20]
         [--small]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bag", type=int, default=15616)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.bag, ns.iters = 256, 2

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.models.transmil import TransMIL
    from llmmil_tpu.train import create_train_state, make_train_step
    from llmmil_tpu.train.losses import multihead_loss

    cfg = Config(modality=["pathology"], model_pathology="TransMIL",
                 model_CI="CLIP", CI_input_version="text",
                 CI_prompt_version="devided", aggregator="TransMIL",
                 loss_point="Last", loss="BCE",
                 compute_dtype="bfloat16", learnablePrompt=1, n_ctx=8,
                 batch_size=1)
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
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    train_step = make_train_step(cfg, donate=False)

    def flat_sum(t):
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(t))

    def loss_at(params, train):
        variables = {"params": params}
        rngs = ({"dropout": jax.random.fold_in(rng, 0),
                 "crops": jax.random.fold_in(rng, 1)} if train else None)
        out = model.apply(variables, batch, train=train, rngs=rngs)
        return multihead_loss(out, batch["label"], cfg.loss_point,
                              cfg.loss, cfg.num_classes)["loss"]

    def fwd(params):
        return loss_at(params, False)

    def grad_eval(params):
        return flat_sum(jax.grad(lambda p: loss_at(p, False))(params))

    def grad_train(params):
        return flat_sum(jax.grad(lambda p: loss_at(p, True))(params))

    def step(params):
        s2, m = train_step(state, batch, rng)
        return m["loss"] + 0.0 * flat_sum(s2.params)

    tmil = TransMIL(n_classes=2, L=512, dtype=jnp.bfloat16)
    tx = jnp.asarray(rs.randn(1, ns.bag, 512), jnp.float32)
    tmask = jnp.asarray(np.arange(ns.bag)[None] < ns.bag - 7)
    tvars = tmil.init(jax.random.PRNGKey(0), tx, train=False)

    def tmil_mask(params):
        def f(pp):
            out, _ = tmil.apply({"params": pp}, tx, mask=tmask, train=False)
            return jnp.sum(out.astype(jnp.float32))
        return flat_sum(jax.grad(f)(params))

    def tmil_drop(params):
        def f(pp):
            out, _ = tmil.apply({"params": pp}, tx, train=True,
                                rngs={"dropout": rng})
            return jnp.sum(out.astype(jnp.float32))
        return flat_sum(jax.grad(f)(params))

    progs = [("fwd", fwd, state.params), ("grad_eval", grad_eval,
                                          state.params),
             ("grad_train", grad_train, state.params),
             ("step", step, state.params),
             ("tmil_mask", tmil_mask, tvars["params"]),
             ("tmil_drop", tmil_drop, tvars["params"])]
    print(f"{'program':<11} {'ms':>8}  compile_s")
    for name, fn, arg in progs:
        try:
            t0 = time.perf_counter()
            comp = jax.jit(fn).lower(arg).compile()
            cs = time.perf_counter() - t0
            float(comp(arg))

            def run_k(k):
                t = time.perf_counter()
                for _ in range(k):
                    out = comp(arg)
                float(out)
                return time.perf_counter() - t

            run_k(1)
            d1 = min(run_k(1) for _ in range(2))
            dk = min(run_k(1 + ns.iters) for _ in range(2))
            print(f"{name:<11} {(dk - d1) / ns.iters * 1e3:>8.2f}  "
                  f"({cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:<11}  FAILED {type(e).__name__}: {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
