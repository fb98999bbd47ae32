#!/usr/bin/env python
"""Decompose MC3 layer1's backward: convs vs BN/relu/dfold glue.

Round-3 per-op benching (scripts/bench_conv3x3.py) showed XLA's isolated
conv emitters at this shape are fast (fwd 11.0 / dx 6.5 / dw 6.0 ms), so
layer1's measured 148.7 ms fwd+grad (stage profile) leaves ~40 ms
unaccounted.  This times layer1 variants at the exact in-model shape
(1, 160, 128, 128, 64):

  block      the real 2×BasicBlock3D stage (dfold, train-mode BN)
  block_eval same but eval-mode BN stats
  nobn       BasicBlock3D with BatchNorm deleted
  convchain  4 bare depth-folded convs + relu (no BN, no residual)

glue = block − convchain ≈ BN-train + residual + any dfold-bwd relayouts.

Usage: python scripts/profile_layer1_glue.py [--iters 15] [--small]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--d", type=int, default=160)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.d, ns.hw, ns.iters, ns.reps = 8, 16, 2, 1

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp
    from llmmil_tpu.models.ct_mc3 import BasicBlock3D, DepthFoldedConv

    dt = jnp.bfloat16 if not ns.small else jnp.float32

    class Stage(nn.Module):
        train_bn: bool = True

        @nn.compact
        def __call__(self, x):
            x = BasicBlock3D(64, 1, True, dt, temporal_mode="dfold",
                             name="b0")(x, train=self.train_bn)
            return BasicBlock3D(64, 1, True, dt, temporal_mode="dfold",
                                name="b1")(x, train=self.train_bn)

    class NoBN(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(2):
                y = DepthFoldedConv(64, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                                    dtype=dt, name=f"c{2 * i}")(x)
                y = nn.relu(y)
                y = DepthFoldedConv(64, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                                    dtype=dt, name=f"c{2 * i + 1}")(y)
                x = nn.relu(x + y)
            return x

    class ConvChain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(4):
                x = nn.relu(DepthFoldedConv(
                    64, (3, 3, 3), (1, 1, 1), (1, 1, 1), dtype=dt,
                    name=f"c{i}")(x))
            return x

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, ns.d, ns.hw, ns.hw, 64), jnp.float32)

    variants = [("block", Stage(train_bn=True)),
                ("block_eval", Stage(train_bn=False)),
                ("nobn", NoBN()),
                ("convchain", ConvChain())]
    print(f"{'variant':<11} {'prog':<5} {'ms':>8}")
    for name, mod in variants:
        variables = mod.init(jax.random.PRNGKey(0), x)
        params = variables["params"]
        stats = {k: v for k, v in variables.items() if k != "params"}

        def fwd(p, xx):
            out = mod.apply({"params": p, **stats}, xx,
                            mutable=list(stats) if (name == "block")
                            else False)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out.astype(jnp.float32))

        def grad(p, xx):
            g = jax.grad(fwd)(p, xx)
            return sum(jnp.sum(jnp.abs(v.astype(jnp.float32)))
                       for v in jax.tree_util.tree_leaves(g))

        for pname, fn in (("fwd", fwd), ("grad", grad)):
            try:
                jf = jax.jit(fn)
                float(jf(params, x))

                def run(k):
                    t0 = time.perf_counter()
                    o = None
                    for _ in range(k):
                        o = jf(params, x)
                    float(o)
                    return time.perf_counter() - t0

                run(1)
                best = None
                for _ in range(ns.reps):
                    d1 = run(1)
                    dk = run(1 + ns.iters)
                    ms = (dk - d1) / ns.iters * 1e3
                    best = ms if best is None else min(best, ms)
                print(f"{name:<11} {pname:<5} {best:>8.2f}", flush=True)
            except Exception as e:
                print(f"{name:<11} {pname:<5} FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
