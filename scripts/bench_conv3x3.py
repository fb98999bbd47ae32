#!/usr/bin/env python
"""Pallas conv3x3 vs XLA at MC3-layer1 production shape, on-TPU.

VERDICT r2 #1 harness.  The dfold layer1 convs — (B·D=160, 128, 128, 192)
→ 64, 3×3 stride-1 — run at ~21% MFU under XLA's conv emitters (BENCH_NOTES
r2 stage profile; the measured in-XLA lowerings are exhausted).  Marginal
timing (K data-dependent iterations chained in one jit vs 1, scalar-fetch
fenced), reporting ms/iter, TFLOP/s, and MFU vs the 197 TFLOP/s v5e bf16
peak, for fwd / full grad (dx+dw), kernel vs XLA.

Usage: python scripts/bench_conv3x3.py [--n 160] [--hw 128] [--c 192]
         [--f 64] [--iters 20] [--reps 5] [--block-h 8,16] [--small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PEAK = 197e12


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=160)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--c", type=int, default=192)
    p.add_argument("--f", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--block-h", type=str, default="8,16")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.n, ns.hw, ns.c, ns.f, ns.iters, ns.reps = 4, 32, 16, 8, 3, 2

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.ops.pallas.conv3x3 import conv3x3, conv3x3_reference

    dt = jnp.dtype(ns.dtype) if not ns.small else jnp.float32
    interp = bool(ns.small)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(ns.n, ns.hw, ns.hw, ns.c), dt)
    w = jnp.asarray(rs.randn(3, 3, ns.c, ns.f) * 0.05, dt)
    flops = 2 * ns.n * ns.hw * ns.hw * 9 * ns.c * ns.f

    def make_fwd(conv):
        def f(x, w, k):
            def body(_, carry):
                acc, xx = carry
                xx = xx + (acc * 1e-12).astype(xx.dtype)
                y = conv(xx, w)
                return jnp.sum(y.astype(jnp.float32)), xx
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), x))
            return acc
        return jax.jit(f, static_argnums=2)

    def make_grad(conv):
        def f(x, w, k):
            def body(_, carry):
                acc, xx = carry
                xx = xx + (acc * 1e-12).astype(xx.dtype)

                def loss(xx_, w_):
                    return jnp.sum(conv(xx_, w_).astype(jnp.float32))

                gx, gw = jax.grad(loss, argnums=(0, 1))(xx, w)
                s = (jnp.sum(gx.astype(jnp.float32))
                     + jnp.sum(gw.astype(jnp.float32)))
                return s, xx
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), x))
            return acc
        return jax.jit(f, static_argnums=2)

    def time_marginal(fn, label, mult):
        try:
            float(fn(x, w, 1))   # warm both compiles (axon does not fence
            float(fn(x, w, 1 + ns.iters))   # on block_until_ready)
            best = None
            for _ in range(ns.reps):
                t0 = time.perf_counter()
                float(fn(x, w, 1))
                d1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(fn(x, w, 1 + ns.iters))
                dk = time.perf_counter() - t0
                ms = (dk - d1) / ns.iters * 1e3
                best = ms if best is None else min(best, ms)
            tf = mult * flops / (best / 1e3)
            print(f"{label:<24} {best:>8.2f} ms  {tf / 1e12:>6.1f} TFLOP/s"
                  f"  {100 * tf / PEAK:>5.1f}% MFU", flush=True)
            return best
        except Exception as e:
            print(f"{label:<24} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return None

    # parity on-device first
    want = conv3x3_reference(x, w)
    for bh in [int(b) for b in ns.block_h.split(",")]:
        got = conv3x3(x, w, bh, interp)
        d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                  - want.astype(jnp.float32))))
        print(f"parity bh={bh}: max|Δ| = {d:.3e}", flush=True)

    print(f"\nshape ({ns.n},{ns.hw},{ns.hw},{ns.c})→{ns.f} {dt}, "
          f"{flops / 1e9:.0f} GFLOP/conv")
    time_marginal(make_fwd(conv3x3_reference), "xla fwd", 1)
    time_marginal(make_grad(conv3x3_reference), "xla grad(dx+dw)", 3)
    for bh in [int(b) for b in ns.block_h.split(",")]:
        def kconv(x_, w_, bh=bh):
            return conv3x3(x_, w_, bh, interp)
        time_marginal(make_fwd(kconv), f"pallas fwd bh={bh}", 1)
        time_marginal(make_grad(kconv), f"pallas grad bh={bh}", 3)


if __name__ == "__main__":
    main()
