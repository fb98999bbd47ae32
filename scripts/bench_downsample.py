#!/usr/bin/env python
"""Compare lowerings of the 1→3ch spacing stem at production shape.

The r2 per-stage profile (scripts/profile_ct_stages.py) shows the im2col
``LowChannelConv3D`` downsampling stem at 0.6% MFU — 88 of the 413 ms
fwd+grad trunk budget.  im2col was introduced to dodge XLA's 21 GiB
3-D-conv weight-grad relayout on 1-channel volumes (BENCH_NOTES r1); this
measures whether the depth-folded 2-D lowering (kd taps → channel concat,
one 2-D conv) dodges it too, and at what speed/memory.

Usage: python scripts/bench_downsample.py [--depth 160] [--hw 512]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=160)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.depth, ns.hw, ns.iters = 8, 32, 2

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.models.ct_mc3 import DepthFoldedConv, LowChannelConv3D

    k, s = (3, 4, 4), (1, 2, 2)
    variants = [
        ("im2col", LowChannelConv3D(3, k, s, ((1, 1), (1, 1), (1, 1)),
                                    use_bias=True, dtype=jnp.bfloat16)),
        ("dfold", DepthFoldedConv(3, k, s, (1, 1, 1), mode="dfold",
                                  use_bias=True, dtype=jnp.bfloat16)),
        ("dsum", DepthFoldedConv(3, k, s, (1, 1, 1), mode="dsum",
                                 use_bias=True, dtype=jnp.bfloat16)),
    ]

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, ns.depth, ns.hw, ns.hw, 1), jnp.float32)
    print(f"{'variant':<8} {'prog':<5} {'ms':>8} {'peak GiB':>9}")
    ref = {}
    for name, mod in variants:
        variables = mod.init(jax.random.PRNGKey(0), x)
        params = variables["params"]

        def fwd(params, xx):
            return jnp.sum(mod.apply({"params": params}, xx)
                           .astype(jnp.float32))

        def grad(params, xx):
            g = jax.grad(lambda pp: fwd(pp, xx))(params)
            return sum(jnp.sum(jnp.abs(v))
                       for v in jax.tree_util.tree_leaves(g))

        # exactness vs im2col (same param tree: kernel 5-D + bias)
        out = mod.apply({"params": params}, x)
        if name == "im2col":
            ref["out"] = out
            ref["params"] = params
        else:
            d = float(jnp.max(jnp.abs(
                mod.apply({"params": ref["params"]}, x).astype(jnp.float32)
                - ref["out"].astype(jnp.float32))))
            print(f"  {name} vs im2col max|Δ| = {d:.2e}")

        for pname, fn in (("fwd", fwd), ("grad", grad)):
            try:
                comp = jax.jit(fn).lower(params, x).compile()
                mem = comp.memory_analysis()
                gib = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                       + mem.output_size_in_bytes) / 2**30
                comp(params, x)          # warm
                t0 = time.perf_counter()
                float(comp(params, x))
                d1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                o = None
                for _ in range(1 + ns.iters):
                    o = comp(params, x)
                float(o)
                dk = time.perf_counter() - t0
                ms = (dk - d1) / ns.iters * 1e3
                print(f"{name:<8} {pname:<5} {ms:>8.2f} {gib:>9.2f}",
                      flush=True)
            except Exception as e:
                print(f"{name:<8} {pname:<5}  FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
