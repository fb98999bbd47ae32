#!/usr/bin/env python
"""Model-zoo benchmark: the reference's timed batch-1 metric per CT family.

The reference's eval driver times per-patient inference (test_ddp.py:214-234)
but only ever records it for one configuration; this sweeps every CT trunk
the model factory dispatches (aggregator.py:17-34) at a production-faithful
size, with the same tri-modal CLIP + TransMIL top as the flagship bench
(scripts/bench_train.py — same marginal-timing methodology: the tunneled
backend doesn't fence on block_until_ready, so step time is
(T(1+K) − T(1)) / K with a scalar fetch per run).

Usage: python scripts/bench_model_zoo.py --model_ct resnet2plus1d_18
       [--depth 160] [--hw ...] [--bag 15616] [--iters 4] [--train]

Per-family default sizes (reference-faithful):
  resnetMC3_18 / resnet2plus1d_18 / medicalNet: 160×512×512 @ 0.6869
  SwinUNETR(_wMask): 160×512×512 volume, 96³ crops ×100 (×3 for wMask)
  MViT: 160×224×224 @ 2.0 (the reference's coarse-spacing in-plane size,
        dataset.py:301-308) — ⌈160/3⌉ 3-slice chunks through MViT-v2-S
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULTS = {
    "resnetMC3_18": dict(hw=512, spacing=[0.6869, 0.6869, 3.0]),
    "resnet2plus1d_18": dict(hw=512, spacing=[0.6869, 0.6869, 3.0]),
    "medicalNet": dict(hw=512, spacing=[0.6869, 0.6869, 3.0]),
    "SwinUNETR": dict(hw=512, spacing=[0.6869, 0.6869, 3.0]),
    "SwinUNETR_wMask": dict(hw=512, spacing=[0.6869, 0.6869, 3.0]),
    "MViT": dict(hw=224, spacing=[2.0, 2.0, 2.5]),
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_ct", required=True, choices=sorted(DEFAULTS))
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--bag", type=int, default=15616)
    p.add_argument("--depth", type=int, default=160)
    p.add_argument("--hw", type=int, default=0, help="0 = family default")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--train", action="store_true",
                   help="also time the train step")
    p.add_argument("--remat", default="layer2")
    p.add_argument("--tiny_ci", action="store_true",
                   help="1-layer toy CLIP tower (CPU smoke runs only)")
    p.add_argument("--swin_n", type=int, default=0,
                   help="SwinUNETR crops per volume (0 = reference default:"
                        " 100, or 3 for wMask)")
    p.add_argument("--swin_crop", type=int, default=0,
                   help="SwinUNETR cubic crop side (0 = reference 96)")
    p.add_argument("--ct_int8", action="store_true",
                   help="also time the int8-quantized CT trunk eval "
                        "(eval/quant.py dispatch — conv trunks only)")
    ns = p.parse_args(argv)

    import jax
    from llmmil_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.train import create_train_state, make_train_step, \
        make_eval_step

    fam = DEFAULTS[ns.model_ct]
    hw = ns.hw or fam["hw"]
    cfg = Config(modality=["CT", "pathology"], model_CT=ns.model_ct,
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", CI_prompt_version="devided",
                 aggregator="TransMIL", loss_point="CT-Pth-Last",
                 loss="BCE+textCosSim", spacing=fam["spacing"],
                 ct_shape=[ns.depth, hw, hw], ct_hw_override=hw,
                 compute_dtype="bfloat16", learnablePrompt=1, n_ctx=8,
                 ct_remat=ns.remat, batch_size=ns.batch,
                 # wMask trunks take the tumour mask as a second channel /
                 # crop centre; the TwoWay flagship handles both
                 wmask_family="twoway",
                 swin_n_subsample=ns.swin_n,
                 swin_crop=[ns.swin_crop] * 3 if ns.swin_crop else [],
                 **(dict(clip_vocab=64, clip_context=16, clip_width=64,
                         clip_heads=4, clip_layers=1, clip_embed=512)
                    if ns.tiny_ci else {}))
    model = build_model(cfg)

    rs = np.random.RandomState(0)
    b = ns.batch
    toks = rs.randint(1, cfg.clip_vocab - 2, (b, 10, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    batch = {
        "input_CT": jnp.asarray(rs.rand(b, ns.depth, hw, hw, 1),
                                jnp.float32),
        "input_pathology": jnp.asarray(rs.randn(b, ns.bag, 768),
                                       jnp.float32),
        "mask_pathology": jnp.asarray(
            np.arange(ns.bag)[None] < rs.randint(ns.bag // 2, ns.bag,
                                                 (b, 1))),
        "input_CI": jnp.asarray(toks, jnp.int32),
        "label": jnp.asarray(np.eye(2)[rs.randint(0, 2, b)], jnp.float32),
    }
    if "wMask" in ns.model_ct:
        m = np.zeros((b, ns.depth, hw, hw, 1), np.float32)
        m[:, ns.depth // 4:ns.depth // 2,
          hw // 4:hw // 2, hw // 4:hw // 2] = 1.0
        batch["mask_CT"] = jnp.asarray(m)

    print(f"{ns.model_ct}: CT {batch['input_CT'].shape} "
          f"bag {batch['input_pathology'].shape}", flush=True)
    t0 = time.perf_counter()
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0),
                               jit_init=True)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"init {time.perf_counter() - t0:.1f}s, "
          f"params {n_params / 1e6:.1f}M", flush=True)

    def measure(once, label):
        t0 = time.perf_counter()
        loss = float(once())
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s, "
              f"loss {loss:.4f}", flush=True)

        def run_k(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = once()
            float(out)
            return time.perf_counter() - t0

        run_k(1)
        d1 = run_k(1)
        dk = run_k(1 + ns.iters)
        step_t = (dk - d1) / ns.iters
        print(f"{label} step: {step_t * 1e3:.1f} ms "
              f"({b / step_t:.2f} samples/s)", flush=True)

    estep = make_eval_step(cfg)
    measure(lambda: estep(state, batch)["loss"], "eval")
    if ns.ct_int8:
        from llmmil_tpu.eval.quant import (calibrate_ct_trunk,
                                           quantize_ct_trunk,
                                           run_trunk_int8)
        qdt = jnp.bfloat16
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        ct_in = batch["input_CT"]
        if "wMask" in ns.model_ct:
            ct_in = jnp.concatenate(
                [ct_in, batch["mask_CT"].astype(ct_in.dtype)], axis=-1)
        t0 = time.perf_counter()
        scales = calibrate_ct_trunk(cfg, variables, [ct_in], dtype=qdt)
        qpack = quantize_ct_trunk(cfg, variables, scales, dtype=qdt)
        print(f"int8 calib+quant {time.perf_counter() - t0:.1f}s, "
              f"{len(qpack['kq'])} sites", flush=True)

        b2 = {k: v for k, v in batch.items()
              if k not in ("input_CT", "mask_CT")}
        import functools
        from llmmil_tpu.utils import compiler_options_from_cfg
        estep_raw = make_eval_step(cfg, jit=False)

        @functools.partial(jax.jit,
                           compiler_options=compiler_options_from_cfg(cfg))
        def int8_step(state, b2, qpack, x):
            feat = run_trunk_int8(cfg, qpack, x, dtype=qdt)
            return estep_raw(state, dict(b2, ct_features=feat))["loss"]

        measure(lambda: int8_step(state, b2, qpack, ct_in), "int8-eval")
    if ns.train:
        rng = jax.random.PRNGKey(1)
        tstep = make_train_step(cfg, donate=False)
        measure(lambda: tstep(state, batch, rng)[1]["loss"], "train")


if __name__ == "__main__":
    main()
