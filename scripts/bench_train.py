#!/usr/bin/env python
"""Real-size flagship training-step benchmark on the attached TPU.

Measures the production configuration (SURVEY §6: CT 160×512×512 at spacing
0.6869, pathology bags ≤15,592×768, CLIP-text CI, TransMIL aggregator,
CT-Pth-Last tri-loss) — one full jitted train step (fwd+bwd+update), bf16
compute, remat on the CT trunk.  Marginal timing (K-chained vs 1) to cancel
the tunnel RPC latency.

Usage: python scripts/bench_train.py [--batch 1] [--bag 15616] [--depth 160]
       [--hw 512] [--iters 4] [--eval]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--bag", type=int, default=15616)   # 15592 → /128 bucket
    p.add_argument("--depth", type=int, default=160)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--eval", action="store_true",
                   help="benchmark inference instead of training")
    p.add_argument("--remat", default="layer2",
                   help="ct_remat: all|early|layer2|none")
    p.add_argument("--fwd-lowering", default="fold",
                   help="ct_fwd_lowering: fold|conv3d (A/B'd in BENCH_NOTES r3)")
    p.add_argument("--ct-int8", action="store_true",
                   help="eval with the int8-quantized CT trunk "
                        "(eval/quant.py; implies --eval)")
    p.add_argument("--nonct-int8", action="store_true",
                   help="eval with the int8-quantized NON-CT dense stack "
                        "(eval/quant_nonct.py; implies --eval, composes "
                        "with --ct-int8)")
    p.add_argument("--assoc", action="store_true",
                   help="reassociated Nystrom serving chain with EXACT "
                        "matmuls (the flop win of --attn-int8 without "
                        "the quantize passes; implies --eval)")
    p.add_argument("--attn-int8", action="store_true",
                   help="two-sided dynamic int8 for the attention/"
                        "Nyström activation GEMMs (ops/dynquant.py; "
                        "implies --eval, composes with the other int8 "
                        "modes)")
    p.add_argument("--json", default="",
                   help="append the measurement (+ full provenance) to "
                        "this JSON file — the machine-checkable flagship "
                        "perf pin (results/flagship_r*.json); a future "
                        "round diffs it instead of reading prose")
    ns = p.parse_args(argv)

    import jax
    from llmmil_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.train import create_train_state, make_train_step, \
        make_eval_step

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", CI_prompt_version="devided",
                 aggregator="TransMIL", loss_point="CT-Pth-Last",
                 loss="BCE+textCosSim", spacing=[0.6869, 0.6869, 3.0],
                 ct_shape=[ns.depth, ns.hw, ns.hw], ct_hw_override=ns.hw,
                 compute_dtype="bfloat16", learnablePrompt=1, n_ctx=8,
                 ct_remat=ns.remat, batch_size=ns.batch,
                 ct_fwd_lowering=ns.fwd_lowering)
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
    print(f"init... CT {batch['input_CT'].shape} bag "
          f"{batch['input_pathology'].shape}", flush=True)
    t0 = time.perf_counter()
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0),
                               jit_init=True)   # 402 s eager → cached jit
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"init {time.perf_counter() - t0:.1f}s, params {n_params / 1e6:.1f}M",
          flush=True)

    rng = jax.random.PRNGKey(1)
    nonct_pack = None
    if ns.nonct_int8:
        from llmmil_tpu.eval.quant_nonct import nonct_int8_pack
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        t0 = time.perf_counter()
        calib = {k: v for k, v in batch.items() if k != "label"}
        nonct_pack = nonct_int8_pack(model, variables, [calib])
        print(f"non-CT int8 calib+quant {time.perf_counter() - t0:.1f}s, "
              f"{len(nonct_pack)} Dense sites", flush=True)

    # the pack must be a jit ARGUMENT, not an interceptor closure —
    # closure capture bakes ~90 MB of int8 weights as HLO constants and
    # the tunneled remote compiler rejects the request (HTTP 413)
    import contextlib

    import flax.linen as nn
    from llmmil_tpu.eval.quant_nonct import _int8_interceptor

    def nonct_ctx(pack):
        if pack is None:
            return contextlib.nullcontext()
        return nn.intercept_methods(_int8_interceptor(pack))

    from llmmil_tpu.ops.dynquant import dynamic_int8_attention

    def attn_ctx():
        if ns.attn_int8:
            return dynamic_int8_attention(True)
        return dynamic_int8_attention(ns.assoc, reassociate_only=True)

    if ns.ct_int8:
        from llmmil_tpu.eval.quant import (calibrate_ct_trunk,
                                           quantize_ct_trunk,
                                           run_trunk_int8)
        qdt = jnp.bfloat16
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        t0 = time.perf_counter()
        scales = calibrate_ct_trunk(cfg, variables, [batch["input_CT"]],
                                    dtype=qdt)
        qpack = quantize_ct_trunk(cfg, variables, scales, dtype=qdt)
        print(f"int8 calib+quant {time.perf_counter() - t0:.1f}s, "
              f"{len(qpack['kq'])} sites", flush=True)
        estep = make_eval_step(cfg, jit=False)   # composed in a top jit
        from llmmil_tpu.utils import compiler_options_from_cfg

        @functools.partial(jax.jit,
                           compiler_options=compiler_options_from_cfg(cfg))
        def int8_step(state, batch, qpack, npack):
            feat = run_trunk_int8(cfg, qpack, batch["input_CT"], dtype=qdt)
            b2 = {k: v for k, v in batch.items() if k != "input_CT"}
            with attn_ctx(), nonct_ctx(npack):
                return estep(state, dict(b2, ct_features=feat))["loss"]

        def once(state, batch):
            return int8_step(state, batch, qpack, nonct_pack)
    elif ns.eval or ns.nonct_int8 or ns.attn_int8 or ns.assoc:
        estep = make_eval_step(cfg, jit=False)
        from llmmil_tpu.utils import compiler_options_from_cfg

        @functools.partial(jax.jit,
                           compiler_options=compiler_options_from_cfg(cfg))
        def eval_step(state, batch, npack):
            with attn_ctx(), nonct_ctx(npack):
                return estep(state, batch)["loss"]

        def once(state, batch):
            return eval_step(state, batch, nonct_pack)
    else:
        train_step = make_train_step(cfg, donate=False)

        def once(state, batch):
            s2, m = train_step(state, batch, rng)
            return m["loss"]

    t0 = time.perf_counter()
    loss = float(once(state, batch))
    print(f"compile+first step {time.perf_counter() - t0:.1f}s, "
          f"loss {loss:.4f}", flush=True)

    # marginal timing
    def run_k(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = once(state, batch)
        float(out)
        return time.perf_counter() - t0

    run_k(1)
    d1 = run_k(1)
    dk = run_k(1 + ns.iters)
    step_t = (dk - d1) / ns.iters
    mode = (("int8ct+" if ns.ct_int8 else "")
            + ("int8nonct+" if ns.nonct_int8 else "")
            + ("int8attn+" if ns.attn_int8 else "")
            + ("assoc+" if ns.assoc and not ns.attn_int8 else "")
            + ("eval" if (ns.eval or ns.ct_int8 or ns.nonct_int8
                          or ns.attn_int8 or ns.assoc)
               else "train"))
    print(f"{mode} step: {step_t * 1e3:.1f} ms "
          f"({b / step_t:.2f} samples/s)", flush=True)

    if ns.json:
        import datetime
        import json
        rec = {
            "mode": mode, "step_ms": round(step_t * 1e3, 2),
            "samples_per_sec": round(b / step_t, 3),
            "batch": b, "bag": ns.bag, "depth": ns.depth, "hw": ns.hw,
            "iters": ns.iters, "remat": ns.remat,
            "fwd_lowering": ns.fwd_lowering,
            "ct_int8": bool(ns.ct_int8), "nonct_int8": bool(ns.nonct_int8),
            "attn_int8": bool(ns.attn_int8), "assoc": bool(ns.assoc or ns.attn_int8),
            "params_m": round(n_params / 1e6, 1),
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
            "jax": jax.__version__,
            "timestamp": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
        }
        rows = []
        if os.path.exists(ns.json):
            with open(ns.json) as f:
                rows = json.load(f)
        rows.append(rec)
        os.makedirs(os.path.dirname(ns.json) or ".", exist_ok=True)
        with open(ns.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"pinned -> {ns.json} ({len(rows)} records)", flush=True)


if __name__ == "__main__":
    main()
