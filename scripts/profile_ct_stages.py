#!/usr/bin/env python
"""Per-stage fwd/grad timing of the CT trunk at production shapes.

After the dfold lowering (BENCH_NOTES r2) the CT-trunk grad is 310 ms at
26.8% MFU; this script attributes that between the im2col spacing stem, the
(3,7,7) trunk stem, and layers 1-4, each timed in isolation at the exact
shape it sees inside the full model — so the next optimisation target is
data, not guess.

Usage: python scripts/profile_ct_stages.py [--depth 160] [--hw 512]
         [--iters 20] [--mode dfold] [--small]
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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mode", default="dfold")
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.depth, ns.hw, ns.iters = 8, 32, 2

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp
    from llmmil_tpu.models.ct_mc3 import (BasicBlock3D, LowChannelConv3D,
                                          _ConvBN)

    d, hw = ns.depth, ns.hw
    mode = ns.mode

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.relu(_ConvBN(64, (3, 7, 7), (1, 2, 2), (1, 3, 3),
                                   dtype=jnp.bfloat16, temporal_mode=mode,
                                   name="stem")(x, train))

    class Down(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return LowChannelConv3D(3, (3, 4, 4), (1, 2, 2),
                                    ((1, 1), (1, 1), (1, 1)), use_bias=True,
                                    dtype=jnp.bfloat16, name="d")(x)

    def layer(feats, n_blocks, temporal, first_stride):
        class Layer(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                for b in range(n_blocks):
                    stride = first_stride if b == 0 else 1
                    x = BasicBlock3D(feats, stride, temporal,
                                     jnp.bfloat16, temporal_mode=mode,
                                     name=f"b{b}")(x, train)
                return x
        return Layer()

    stages = [
        ("downsamp", Down(), (1, d, hw, hw, 1)),
        ("stem377", Stem(), (1, d, hw // 2, hw // 2, 3)),
        ("layer1", layer(64, 2, True, 1), (1, d, hw // 4, hw // 4, 64)),
        ("layer2", layer(128, 2, False, 2), (1, d, hw // 4, hw // 4, 64)),
        ("layer3", layer(256, 2, False, 2), (1, d, hw // 8, hw // 8, 128)),
        ("layer4", layer(512, 2, False, 2), (1, d, hw // 16, hw // 16, 256)),
    ]

    def marginal_ms(fn, args, iters):
        compiled = jax.jit(fn).lower(*args).compile()

        def run_k(k):
            t = time.perf_counter()
            for _ in range(k):
                out = compiled(*args)
            float(out)
            return time.perf_counter() - t

        run_k(1)
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
        return (dk - d1) / iters * 1e3, flops

    rs = np.random.RandomState(0)
    print(f"mode={mode} depth={d} hw={hw}\n")
    print(f"{'stage':<9} {'prog':<5} {'ms':>8} {'TFLOP':>7} {'MFU%':>6}")
    tot = {"fwd": 0.0, "grad": 0.0}
    for name, mod, shape in stages:
        x = jnp.asarray(rs.rand(*shape), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x, train=False)
        bn = {k: v for k, v in variables.items() if k != "params"}

        def fwd(params, xx):
            return jnp.sum(mod.apply({"params": params, **bn}, xx,
                                     train=False).astype(jnp.float32))

        def grad(params, xx):
            def f(pp):
                if bn:
                    out, _ = mod.apply({"params": pp, **bn}, xx, train=True,
                                       mutable=list(bn.keys()))
                else:
                    out = mod.apply({"params": pp}, xx, train=True)
                return jnp.sum(out.astype(jnp.float32))
            g = jax.grad(f)(params)
            return sum(jnp.sum(jnp.abs(v))
                       for v in jax.tree_util.tree_leaves(g))

        for pname, fn in (("fwd", fwd), ("grad", grad)):
            ms, flops = marginal_ms(fn, (variables["params"], x), ns.iters)
            tf = flops / 1e12 if flops else float("nan")
            mfu = 100.0 * tf / (ms / 1e3) / V5E_PEAK_TFLOPS
            tot[pname] += ms
            print(f"{name:<9} {pname:<5} {ms:>8.1f} {tf:>7.2f} {mfu:>6.1f}",
                  flush=True)
    print(f"\nsum fwd {tot['fwd']:.1f} ms, sum grad {tot['grad']:.1f} ms "
          f"(full-trunk measured: fwd 103 / grad 310 at dfold)")


if __name__ == "__main__":
    main()
