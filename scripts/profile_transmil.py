#!/usr/bin/env python
"""Component-level fwd/grad timing of the non-CT step residual.

profile_nonct.py measured the pathology+CI flagship at 9.8 ms eval but
281 ms train — the backward is ~29× the forward, so something in the
TransMIL / TwoWay / CLIP backward is pathological.  This times each
component's fwd and grad in isolation at production shapes (bag 15,616,
batch 1, bf16) to find it.

Usage: python scripts/profile_transmil.py [--bag 15616] [--iters 20]
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
    import flax.linen as nn
    import jax.numpy as jnp
    from llmmil_tpu.models.transmil import PPEG, TransMIL
    from llmmil_tpu.models.twoway import TwoWayTransformer
    from llmmil_tpu.models.clip_text import (CLIPTextConfig,
                                             CoOpClinicalEncoder)
    from llmmil_tpu.models.transmil import NystromSelfAttention

    rs = np.random.RandomState(0)
    N = ns.bag
    side = int(np.ceil(np.sqrt(N + 1)))

    class TwoWayWrap(nn.Module):
        @nn.compact
        def __call__(self, tokens, ci, train=False):
            from llmmil_tpu.ops.positional import sinusoidal_pe
            pe = sinusoidal_pe(tokens.shape[1], 512,
                               dtype=tokens.dtype)[None]
            q, k = TwoWayTransformer(depth=2, embedding_dim=512,
                                     num_heads=8, mlp_dim=2048,
                                     dtype=jnp.bfloat16, name="tw")(
                tokens, pe, ci)
            return q, k

    class NysWrap(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            out, _ = NystromSelfAttention(
                dim=512, heads=8, dim_head=64, num_landmarks=256,
                pinv_iterations=6, dtype=jnp.bfloat16, name="nys")(
                x, train=train)
            return out

    class PPEGWrap(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            # x: (B, 1+side*side, 512) — cls + grid tokens
            return PPEG(dim=512, dtype=jnp.bfloat16, name="ppeg")(
                x, side, side)

    tcfg = CLIPTextConfig()

    class CLIPWrap(nn.Module):
        @nn.compact
        def __call__(self, toks, train=False):
            return CoOpClinicalEncoder(n_prompts=10, n_ctx=8,
                                       learnable=True, cfg=tcfg,
                                       dtype=jnp.bfloat16, name="ci")(toks)

    toks = rs.randint(1, tcfg.vocab_size - 2, (1, 10, tcfg.context_length))
    toks[..., -1] = tcfg.vocab_size - 1

    comps = [
        ("transmil", TransMIL(n_classes=2, L=512, dtype=jnp.bfloat16),
         (jnp.asarray(rs.randn(1, N, 512), jnp.float32),)),
        ("nystrom", NysWrap(),
         (jnp.asarray(rs.randn(1, side * side + 1, 512), jnp.float32),)),
        ("ppeg", PPEGWrap(),
         (jnp.asarray(rs.randn(1, side * side + 1, 512), jnp.float32),)),
        ("twoway", TwoWayWrap(),
         (jnp.asarray(rs.randn(1, N, 512), jnp.float32),
          jnp.asarray(rs.randn(1, 10, 512), jnp.float32))),
        ("clip", CLIPWrap(), (jnp.asarray(toks, jnp.int32),)),
    ]

    def flat_sum(t):
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(t))

    PEAK = 197e12    # v5e bf16

    def aot_flops(comp):
        try:
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:
            return 0.0

    print(f"{'component':<10} {'prog':<5} {'ms':>8} {'GFLOP':>8} "
          f"{'TFLOP/s':>8} {'MFU%':>6}  compile_s")
    for name, mod, args in comps:
        try:
            variables = mod.init(jax.random.PRNGKey(0), *args, train=False)
        except Exception as e:
            print(f"{name:<10} INIT FAILED {type(e).__name__}: "
                  f"{str(e)[:90]}")
            continue
        params = variables["params"]

        def fwd(params, *a):
            out = mod.apply({"params": params}, *a, train=False)
            return flat_sum(out)

        def grad(params, *a):
            return flat_sum(jax.grad(lambda p: fwd(p, *a))(params))

        for pname, fn in (("fwd", fwd), ("grad", grad)):
            try:
                t0 = time.perf_counter()
                comp = jax.jit(fn).lower(params, *args).compile()
                cs = time.perf_counter() - t0
                float(comp(params, *args))

                def run_k(k):
                    t = time.perf_counter()
                    for _ in range(k):
                        out = comp(params, *args)
                    float(out)
                    return time.perf_counter() - t

                run_k(1)
                d1 = min(run_k(1) for _ in range(2))
                dk = min(run_k(1 + ns.iters) for _ in range(2))
                ms = (dk - d1) / ns.iters * 1e3
                fl = aot_flops(comp)
                tf = fl / (ms / 1e3) if ms > 0 else 0.0
                print(f"{name:<10} {pname:<5} {ms:>8.2f} {fl / 1e9:>8.1f} "
                      f"{tf / 1e12:>8.1f} {100 * tf / PEAK:>6.1f}  "
                      f"({cs:.0f}s)", flush=True)
            except Exception as e:
                print(f"{name:<10} {pname:<5}  FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
