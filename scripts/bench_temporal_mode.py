#!/usr/bin/env python
"""Measure CT-trunk fwd/grad per ct_temporal_mode on the attached TPU.

The r2 profile attributed 1075/1193 ms of the production train step to the
CT-trunk backward at ~8% MFU; MC3's only true 3-D convs are the stem
(3,7,7) and layer1's (3,3,3)s (layers 2-4 are (1,3,3), already folded to
2-D).  DepthFoldedConv recomputes those identically via 2-D convs; this
script decides which lowering wins at production size.

Usage: python scripts/bench_temporal_mode.py [--depth 160] [--hw 512]
         [--iters 8] [--modes conv3d dfold dsum dshift] [--small]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_PEAK_TFLOPS = 197.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=160)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--modes", nargs="+",
                   default=["conv3d", "dfold", "dsum", "dshift"])
    p.add_argument("--remat", default="early")
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.depth, ns.hw = 8, 32

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.models.ct_mc3 import ResnetMC3_18

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, ns.depth, ns.hw, ns.hw, 1), jnp.float32)

    def marginal_ms(fn, args, iters):
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(*args).compile()
        comp_s = time.perf_counter() - t0

        def run_k(k):
            t = time.perf_counter()
            for _ in range(k):
                out = compiled(*args)
            float(out)
            return time.perf_counter() - t

        run_k(1)                                   # warm
        d1 = min(run_k(1) for _ in range(2))
        dk = min(run_k(1 + iters) for _ in range(2))
        flops = None
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops")
        except Exception:
            pass
        return (dk - d1) / iters * 1e3, comp_s, flops

    print(f"shape (1,{ns.depth},{ns.hw},{ns.hw},1) bf16 remat={ns.remat}\n")
    print(f"{'mode':<8} {'prog':<5} {'ms/iter':>9} {'TFLOP':>7} "
          f"{'MFU%':>6}  compile")
    for mode in ns.modes:
        ct = ResnetMC3_18(remat=ns.remat, temporal_mode=mode,
                          dtype=jnp.bfloat16)
        variables = ct.init(jax.random.PRNGKey(0), x, train=False)
        bn = {k: v for k, v in variables.items() if k != "params"}

        def fwd(params, xx):
            return jnp.sum(ct.apply({"params": params, **bn}, xx,
                                    train=False).astype(jnp.float32))

        def grad(params, xx):
            def f(pp):
                out, _ = ct.apply({"params": pp, **bn}, xx, train=True,
                                  mutable=list(bn.keys()))
                return jnp.sum(out.astype(jnp.float32))
            g = jax.grad(f)(params)
            return sum(jnp.sum(jnp.abs(v))
                       for v in jax.tree_util.tree_leaves(g))

        for pname, fn in (("fwd", fwd), ("grad", grad)):
            ms, comp_s, flops = marginal_ms(
                fn, (variables["params"], x), ns.iters)
            tf = flops / 1e12 if flops else float("nan")
            mfu = 100.0 * tf / (ms / 1e3) / V5E_PEAK_TFLOPS
            print(f"{mode:<8} {pname:<5} {ms:>9.1f} {tf:>7.2f} "
                  f"{mfu:>6.1f}  ({comp_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
