#!/usr/bin/env python
"""Time the non-CT part of the flagship step at production size.

The CT trunk is profiled to its stage roofline (profile_ct_stages.py);
this isolates the rest — CLIP-text CI encode, fc_pathology, the two
TwoWayTransformer fusions, TransMIL over the ~15.8k-token concat stream,
heads and tri-loss — by running the SAME flagship config minus the CT
modality (pathology+CI), bag 15,616, batch 1, bf16.

Usage: python scripts/profile_nonct.py [--bag 15616] [--iters 20] [--small]
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
    from llmmil_tpu.train import (create_train_state, make_eval_step,
                                  make_train_step)

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
    eval_step = make_eval_step(cfg)

    def tr(state, batch):
        s2, m = train_step(state, batch, rng)
        upd = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                  for x in jax.tree_util.tree_leaves(s2.params))
        return m["loss"] + 0.0 * upd

    def ev(state, batch):
        return eval_step(state, batch)["loss"]

    for name, fn in (("eval", ev), ("train", tr)):
        t0 = time.perf_counter()
        float(fn(state, batch))
        print(f"{name} compile {time.perf_counter() - t0:.0f}s", flush=True)

        def run_k(k):
            t = time.perf_counter()
            for _ in range(k):
                out = fn(state, batch)
            float(out)
            return time.perf_counter() - t

        run_k(1)
        d1 = min(run_k(1) for _ in range(2))
        dk = min(run_k(1 + ns.iters) for _ in range(2))
        print(f"{name}: {(dk - d1) / ns.iters * 1e3:.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
