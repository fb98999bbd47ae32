#!/usr/bin/env python
"""Batch-size sweep at production size (VERDICT r1 #8).

Sweeps the flagship at CT 160×512×512 + bag 15616 over batch sizes for
- serving (inference forward, the reference's timed metric
  test_ddp.py:214-234), and
- training (full train step),
recording ms/step, samples/s, and AOT-estimated device memory.  OOM at a
given batch is caught and reported as a data point, not a crash.

Usage: python scripts/bench_batch_sweep.py [--batches 1 2 4 8]
         [--train-batches 1 2] [--iters 8] [--small]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--train-batches", type=int, nargs="+", default=[1, 2])
    p.add_argument("--depth", type=int, default=160)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--bag", type=int, default=15616)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--temporal-mode", default="dfold")
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.depth, ns.hw, ns.bag = 8, 32, 128

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.train import create_train_state, make_train_step

    def make_batch(cfg, b, rs):
        toks = rs.randint(1, cfg.clip_vocab - 2, (b, 10, cfg.clip_context))
        toks[..., -1] = cfg.clip_vocab - 1
        return {
            "input_CT": jnp.asarray(
                rs.rand(b, ns.depth, ns.hw, ns.hw, 1), jnp.float32),
            "input_pathology": jnp.asarray(
                rs.randn(b, ns.bag, 768), jnp.float32),
            "mask_pathology": jnp.asarray(
                np.arange(ns.bag)[None] < rs.randint(
                    ns.bag // 2, ns.bag, (b, 1))),
            "input_CI": jnp.asarray(toks, jnp.int32),
            "label": jnp.asarray(
                np.eye(2)[rs.randint(0, 2, b)], jnp.float32),
        }

    def marginal_ms(fn, args, iters):
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(*args).compile()
        comp_s = time.perf_counter() - t0
        gib = float("nan")
        try:
            ma = compiled.memory_analysis()
            gib = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                   + ma.output_size_in_bytes) / 2**30
        except Exception:
            pass

        def run_k(k):
            t = time.perf_counter()
            for _ in range(k):
                out = compiled(*args)
            float(out)
            return time.perf_counter() - t

        run_k(1)
        d1 = min(run_k(1) for _ in range(2))
        dk = min(run_k(1 + iters) for _ in range(2))
        return (dk - d1) / iters * 1e3, comp_s, gib

    base = dict(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                model_pathology="TransMIL", model_CI="CLIP",
                CI_input_version="text", CI_prompt_version="devided",
                aggregator="TransMIL", loss_point="CT-Pth-Last",
                loss="BCE+textCosSim", spacing=[0.6869, 0.6869, 3.0],
                ct_shape=[ns.depth, ns.hw, ns.hw], ct_hw_override=ns.hw,
                compute_dtype="bfloat16", learnablePrompt=1, n_ctx=8,
                ct_remat="early", ct_temporal_mode=ns.temporal_mode)
    small = dict(clip_vocab=512, clip_context=24, clip_width=64,
                 clip_heads=4, clip_layers=2, clip_embed=64)
    rs = np.random.RandomState(0)

    print(f"CT ({ns.depth},{ns.hw},{ns.hw}) bag {ns.bag} bf16 "
          f"temporal={ns.temporal_mode}\n")
    print(f"{'prog':<7} {'batch':>5} {'ms/step':>9} {'samp/s':>8} "
          f"{'GiB':>6}  compile")

    # init ONCE at batch 1: params are batch-independent, and an eager init
    # at batch 8 OOMs the chip (the im2col stem materialises ~16 GiB)
    cfg = Config(**base, batch_size=1)
    if ns.small:
        cfg = cfg.replace(**small)
    model = build_model(cfg)
    state = create_train_state(model, cfg, make_batch(cfg, 1, rs),
                               jax.random.PRNGKey(0))
    extra = ({"batch_stats": state.batch_stats}
             if state.batch_stats else {})
    print("init done", flush=True)

    def fwd(params, bt):
        out = model.apply({"params": params, **extra}, bt, train=False)
        return out["probs"].astype(jnp.float32).sum()

    for b in ns.batches:
        try:
            batch = make_batch(cfg, b, rs)
            ms, comp_s, gib = marginal_ms(
                fwd, (state.params, batch), ns.iters)
            print(f"{'infer':<7} {b:>5} {ms:>9.1f} {b / (ms / 1e3):>8.2f} "
                  f"{gib:>6.2f}  ({comp_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{'infer':<7} {b:>5}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
        finally:
            batch = None

    rng = jax.random.PRNGKey(1)
    train_step = make_train_step(cfg, donate=False)

    def step(st, bt):
        s2, m = train_step(st, bt, rng)
        upd = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                  for x in jax.tree_util.tree_leaves(s2.params))
        return m["loss"] + 0.0 * upd

    for b in ns.train_batches:
        try:
            batch = make_batch(cfg, b, rs)
            ms, comp_s, gib = marginal_ms(step, (state, batch), ns.iters)
            print(f"{'train':<7} {b:>5} {ms:>9.1f} {b / (ms / 1e3):>8.2f} "
                  f"{gib:>6.2f}  ({comp_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{'train':<7} {b:>5}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
        finally:
            batch = None


if __name__ == "__main__":
    main()
