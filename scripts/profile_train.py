#!/usr/bin/env python
"""Attribute the production-size train-step time on the attached TPU.

VERDICT r1 #2: the flagship trains at 1.19 s/step while 3×fwd predicts
~0.46 s — this script breaks the step down and computes MFU.  The tunneled
backend can't serve jax.profiler traces reliably, so attribution uses:

- AOT ``cost_analysis()`` FLOPs per compiled program → MFU per program;
- marginal timing (K-chained vs 1, scalar-fetch fenced — BENCH_NOTES
  methodology) of ablation programs that isolate suspects:
    fwd            inference forward (the 3×fwd baseline unit)
    grad           loss + gradients, train-mode stats (BN batch stats,
                   dropout) — no optimizer
    grad_eval      same gradients but eval-mode stats (isolates BN
                   train-mode reductions + dropout)
    step           full train step (grad + Adam update + BN stat update)
    ct_grad        CT-trunk-only gradients (isolates the 3-D CNN)

Usage: python scripts/profile_train.py [--batch 1] [--bag 15616]
         [--depth 160] [--hw 512] [--iters 3] [--small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_PEAK_TFLOPS = 197.0          # bf16 peak of one v5e chip


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--bag", type=int, default=15616)
    p.add_argument("--depth", type=int, default=160)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--small", action="store_true",
                   help="tiny shapes (smoke-test the script on CPU)")
    ns = p.parse_args(argv)
    if ns.small:
        ns.depth, ns.hw, ns.bag = 8, 32, 128

    import jax
    if ns.small:                     # smoke-test off-TPU (site hook pins axon)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.train import create_train_state, make_train_step
    from llmmil_tpu.train.losses import multihead_loss

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", CI_prompt_version="devided",
                 aggregator="TransMIL", loss_point="CT-Pth-Last",
                 loss="BCE+textCosSim", spacing=[0.6869, 0.6869, 3.0],
                 ct_shape=[ns.depth, ns.hw, ns.hw], ct_hw_override=ns.hw,
                 compute_dtype="bfloat16", learnablePrompt=1, n_ctx=8,
                 ct_remat="early", batch_size=ns.batch)
    if ns.small:
        cfg = cfg.replace(clip_vocab=512, clip_context=24, clip_width=64,
                          clip_heads=4, clip_layers=2, clip_embed=64)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    b = ns.batch
    toks = rs.randint(1, cfg.clip_vocab - 2, (b, 10, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    batch = {
        "input_CT": jnp.asarray(rs.rand(b, ns.depth, ns.hw, ns.hw, 1),
                                jnp.float32),
        "input_pathology": jnp.asarray(rs.randn(b, ns.bag, 768),
                                       jnp.float32),
        "mask_pathology": jnp.asarray(
            np.arange(ns.bag)[None] < rs.randint(ns.bag // 2, ns.bag,
                                                 (b, 1))),
        "input_CI": jnp.asarray(toks, jnp.int32),
        "label": jnp.asarray(np.eye(2)[rs.randint(0, 2, b)], jnp.float32),
    }
    t0 = time.perf_counter()
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"init {time.perf_counter() - t0:.1f}s, "
          f"params {n_params / 1e6:.1f}M", flush=True)
    rng = jax.random.PRNGKey(1)

    has_bn = state.batch_stats is not None and \
        jax.tree_util.tree_leaves(state.batch_stats)
    extra = {"batch_stats": state.batch_stats} if has_bn else {}

    # ---- programs ---------------------------------------------------------
    def fwd(params, batch):
        out = model.apply({"params": params, **extra}, batch, train=False)
        return out["probs"].sum()

    def loss_fn(params, batch, train: bool):
        vs = {"params": params, **extra}
        if train:
            out, _ = model.apply(
                vs, batch, train=True,
                rngs={"dropout": rng, "crops": rng},
                mutable=["batch_stats"] if has_bn else [])
        else:
            out = model.apply(vs, batch, train=False)
        terms = multihead_loss(out, batch["label"], cfg.loss_point,
                               cfg.loss, cfg.num_classes)
        return terms["loss"]

    def grad_train(params, batch):
        g = jax.grad(loss_fn)(params, batch, True)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))

    def grad_eval(params, batch):
        g = jax.grad(loss_fn)(params, batch, False)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))

    train_step = make_train_step(cfg, donate=False)

    def full_step(state_, batch):
        s2, m = train_step(state_, batch, rng)
        # force the whole update: returning only the loss lets XLA DCE the
        # entire backward + optimizer (measured: 161 ms vs the real 1193 ms)
        upd = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                  for x in jax.tree_util.tree_leaves(s2.params))
        return m["loss"] + 0.0 * upd

    # CT-trunk-only gradient (isolates the 3-D CNN + BN)
    from llmmil_tpu.models.aggregator import make_ct_extractor
    ct = make_ct_extractor(cfg, jnp.bfloat16)
    ct_vars = ct.init(jax.random.PRNGKey(0), batch["input_CT"], train=False)
    ct_state = {k: v for k, v in ct_vars.items() if k != "params"}

    def ct_grad(params, x):
        def f(p):
            vs = {"params": p, **ct_state}
            out, _ = ct.apply(vs, x, train=True,
                              mutable=list(ct_state.keys()))
            return jnp.sum(out.astype(jnp.float32))
        g = jax.grad(f)(params)
        return sum(jnp.sum(jnp.abs(v))
                   for v in jax.tree_util.tree_leaves(g))

    programs = {
        "fwd": (fwd, (state.params, batch)),
        "grad_eval": (grad_eval, (state.params, batch)),
        "grad": (grad_train, (state.params, batch)),
        "step": (full_step, (state, batch)),
        "ct_grad": (ct_grad, (ct_vars["params"], batch["input_CT"])),
    }

    # ---- measure ----------------------------------------------------------
    def marginal_ms(fn, args, iters):
        # AOT: one compile serves both execution and cost analysis (remote
        # compiles of the full-size graphs take minutes — don't do it twice)
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(*args).compile()
        compile_s = time.perf_counter() - t0

        def run_k(k):
            t = time.perf_counter()
            for _ in range(k):
                out = compiled(*args)
            float(out if not isinstance(out, tuple) else out[0])
            return time.perf_counter() - t

        val = run_k(1)                       # warm
        d1 = min(run_k(1) for _ in range(2))
        dk = min(run_k(1 + iters) for _ in range(2))
        ms = (dk - d1) / iters * 1e3
        flops = None
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops")
        except Exception as e:
            print(f"  (cost_analysis unavailable: {e})")
        return ms, compile_s, flops, val

    print(f"\nshapes: CT {batch['input_CT'].shape} bag {ns.bag} "
          f"batch {b}\n")
    print(f"{'program':<10} {'ms/iter':>9} {'TFLOP':>8} {'TFLOP/s':>8} "
          f"{'MFU%':>6}  note")
    results = {}
    for name, (fn, args) in programs.items():
        ms, comp_s, flops, _ = marginal_ms(fn, args, ns.iters)
        tf = flops / 1e12 if flops else float("nan")
        tfs = tf / (ms / 1e3) if flops else float("nan")
        mfu = 100.0 * tfs / V5E_PEAK_TFLOPS
        results[name] = (ms, tf)
        print(f"{name:<10} {ms:>9.1f} {tf:>8.2f} {tfs:>8.1f} {mfu:>6.1f}"
              f"  (compile {comp_s:.0f}s)", flush=True)

    fwd_ms = results["fwd"][0]
    step_ms = results["step"][0]
    print(f"\nstep/fwd ratio: {step_ms / fwd_ms:.2f}x (ideal ~3x)")
    print(f"BN/dropout train-mode cost: grad {results['grad'][0]:.0f} ms vs "
          f"grad_eval {results['grad_eval'][0]:.0f} ms "
          f"(+{results['grad'][0] - results['grad_eval'][0]:.0f} ms)")
    print(f"optimizer+stat-update overhead: step {step_ms:.0f} ms vs "
          f"grad {results['grad'][0]:.0f} ms "
          f"(+{step_ms - results['grad'][0]:.0f} ms)")
    print(f"CT-trunk share of grad: {results['ct_grad'][0]:.0f} / "
          f"{results['grad'][0]:.0f} ms")


if __name__ == "__main__":
    main()
