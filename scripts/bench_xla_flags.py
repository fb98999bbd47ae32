#!/usr/bin/env python
"""XLA compiler-option sweep on the flagship train step.

The CT trunk sits at XLA's measured per-op emitter bound (BENCH_NOTES r3:
fwd 26.7% MFU at the cout-64 lane-fill ceiling, grads 45-49%) and three
Pallas kernel strategies lost to those emitters — the remaining untried
lever is XLA's own tuning knobs.  The main one on TPU is the scoped-VMEM
budget (``xla_tpu_scoped_vmem_limit_kib``), which bounds how much VMEM
the fusion/emitter passes may assume: a bigger budget can deepen fusions
and widen conv tiles; too big starves double-buffering.

Options are passed per-compile via ``jit(...).lower(args).compile(
compiler_options=...)`` — NOT via client-side XLA_FLAGS: on the tunneled
axon backend the compile runs on the REMOTE server, and client env vars
never reach it, whereas compiler_options serialize through the PJRT
CompileOptions (verified: an unknown option fails the remote compile with
an HTTP 500 from /remote_compile, so options demonstrably arrive).

One process, one trace: the step is lowered once and recompiled per
point, so init/tracing (~minutes on this host) is paid once and points
share identical HLO.  The persistent jax cache is NOT enabled here —
cache keys may not cover env_option_overrides, and a stale hit would
silently serve the baseline executable for every point.

Points run strictly one at a time on the single tunneled chip.

Usage: python scripts/bench_xla_flags.py [--iters 4] [--eval]
         [--points vmem64m,lhs] [--batch 1 --depth 160 --hw 512 ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

POINTS = {
    "baseline": {},
    "vmem16m": {"xla_tpu_scoped_vmem_limit_kib": "16384"},
    "vmem24m": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--bag", type=int, default=15616)
    p.add_argument("--depth", type=int, default=160)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--remat", default="layer2")
    p.add_argument("--points", default=",".join(POINTS))
    ns = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.train import (create_train_state, make_eval_step,
                                  make_train_step)

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", CI_prompt_version="devided",
                 aggregator="TransMIL", loss_point="CT-Pth-Last",
                 loss="BCE+textCosSim", spacing=[0.6869, 0.6869, 3.0],
                 ct_shape=[ns.depth, ns.hw, ns.hw], ct_hw_override=ns.hw,
                 compute_dtype="bfloat16", learnablePrompt=1, n_ctx=8,
                 ct_remat=ns.remat, batch_size=ns.batch,
                 # the sweep's points ARE the compiler options — zero the
                 # config default so lower().compile(compiler_options=...)
                 # is the only source (a jit-level option would conflict)
                 xla_options=[])
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
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)
    rng = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    if ns.eval:
        step = make_eval_step(cfg)
        lowered = step.lower(state, batch)

        def run(compiled):
            return compiled(state, batch)["loss"]
    else:
        step = make_train_step(cfg, donate=False)
        lowered = step.lower(state, batch, rng)

        def run(compiled):
            _, m = compiled(state, batch, rng)
            return m["loss"]
    print(f"trace+lower {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for name in (s.strip() for s in ns.points.split(",")):
        if name not in POINTS:
            print(f"unknown point {name!r}; have {list(POINTS)}",
                  flush=True)
            continue
        opts = POINTS[name]
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile(
                compiler_options=opts if opts else None)
        except Exception as e:
            print(f"{name:<10} COMPILE-FAIL after "
                  f"{time.perf_counter() - t0:.0f}s: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            continue
        t_compile = time.perf_counter() - t0
        loss = float(run(compiled))

        def run_k(k):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = run(compiled)
            float(out)
            return time.perf_counter() - t0

        run_k(1)
        d1 = run_k(1)
        dk = run_k(1 + ns.iters)
        ms = (dk - d1) / ns.iters * 1e3
        results[name] = ms
        print(f"{name:<10} {ms:8.1f} ms  (loss {loss:.4f}, compile "
              f"{t_compile:.0f}s, {opts or 'no options'})", flush=True)
        del compiled

    if results:
        best = min(results, key=results.get)
        base = results.get("baseline")
        print(f"\nbest: {best} {results[best]:.1f} ms"
              + (f" ({base / results[best]:.3f}x vs baseline {base:.1f})"
                 if base else ""), flush=True)


if __name__ == "__main__":
    main()
