#!/usr/bin/env python
"""Probe: does XLA-on-this-TPU lower int8 convs to the MXU, and at what
speed vs bf16?  Gates the serving-quantization design (v5e int8 peak is
~2x bf16).  Shapes: MC3-layer1's dfold conv (the serving hot op).

Usage: python scripts/probe_int8_conv.py [--small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PEAK_BF16 = 197e12


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=160)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--c", type=int, default=192)
    p.add_argument("--f", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.n, ns.hw, ns.c, ns.f, ns.iters, ns.reps = 4, 16, 8, 8, 2, 1

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    x8 = jnp.asarray(rs.randint(-127, 128, (ns.n, ns.hw, ns.hw, ns.c)),
                     jnp.int8)
    w8 = jnp.asarray(rs.randint(-127, 128, (3, 3, ns.c, ns.f)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)
    flops = 2 * ns.n * ns.hw * ns.hw * 9 * ns.c * ns.f

    def conv(a, b, pet):
        return jax.lax.conv_general_dilated(
            a, b, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    # correctness: int8 conv vs fp32 reference on small values
    try:
        got = conv(x8, w8, jnp.int32)
        ref = conv(x8.astype(jnp.float32), w8.astype(jnp.float32),
                   jnp.float32)
        d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        print(f"int8 conv supported; exactness vs fp32: max|delta|={d:.1f}",
              flush=True)
    except Exception as e:
        print(f"int8 conv FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return

    # also probe int8 dot_general (the 9-tap GEMM fallback shape)
    try:
        a = jnp.asarray(rs.randint(-127, 128, (ns.n * ns.hw * ns.hw, ns.c)),
                        jnp.int8)
        b = jnp.asarray(rs.randint(-127, 128, (ns.c, ns.f)), jnp.int8)
        got = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        print("int8 dot_general supported", flush=True)
    except Exception as e:
        print(f"int8 dot_general FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    def chained(fn, a_, b_):
        def g(a__, b__, kk):
            def body(_, carry):
                acc, aa = carry
                # data-dependent perturbation (runtime-zero, not static)
                # so XLA cannot hoist the conv out of the loop — works
                # for int8 operands too
                if jnp.issubdtype(aa.dtype, jnp.integer):
                    aa = aa + (acc * 1e-12).astype(jnp.int32).astype(
                        aa.dtype)
                else:
                    aa = aa + (acc * 1e-12).astype(aa.dtype)
                out = fn(aa, b__)
                return jnp.sum(out.astype(jnp.float32)), aa
            acc, _ = jax.lax.fori_loop(0, kk, body, (jnp.float32(0.0), a__))
            return acc
        jf = jax.jit(g, static_argnums=2)
        return lambda kk: jf(a_, b_, kk)

    def time_marginal(run, label):
        try:
            float(run(1)); float(run(1 + ns.iters))
            best = None
            for _ in range(ns.reps):
                t0 = time.perf_counter(); float(run(1))
                d1 = time.perf_counter() - t0
                t0 = time.perf_counter(); float(run(1 + ns.iters))
                dk = time.perf_counter() - t0
                ms = (dk - d1) / ns.iters * 1e3
                best = ms if best is None else min(best, ms)
            tf = flops / (best / 1e3)
            print(f"{label:<30} {best:>8.2f} ms  {tf / 1e12:>6.1f} TOP/s"
                  f"  {100 * tf / PEAK_BF16:>5.1f}% of bf16 peak",
                  flush=True)
        except Exception as e:
            print(f"{label:<30} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    time_marginal(chained(lambda a, b: conv(a, b, jnp.bfloat16), xb, wb),
                  "bf16 conv")
    time_marginal(chained(lambda a, b: conv(a, b, jnp.int32), x8, w8),
                  "int8 conv -> int32")
    time_marginal(chained(lambda a, b: conv(a, b, jnp.bfloat16), x8.astype(
        jnp.bfloat16), w8.astype(jnp.bfloat16)), "bf16 conv (int vals)")


if __name__ == "__main__":
    main()
