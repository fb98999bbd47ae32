#!/usr/bin/env python
"""Forward-lowering shootout at MC3-layer1's in-model shape.

scripts/bench_dpack.py found the RAW pack2 conv (cin 256, cout 128) runs
1.77x faster than the dfold conv on useful FLOPs (66% vs 28% raw MFU),
but the stride-2 window fold + output unpack glue eats the entire win.
The glue-free formulation of the same packed math is a 3-D conv:

    y2[b, t, h, w, p*F+f] = sum_dz x[b, 2t+dz-1, ...] W[dz, ...]
    == conv3d(x, W(4,3,3,C,2F) block-sparse, stride (2,1,1))

Round 1 ruled out 3-D convs for the *gradients* (8% MFU emitters); the
isolated 3-D *forward* emitter was never measured.  Since a custom_vjp
can route the backward through the measured-good dfold emitters
(dgrad 45% / wgrad 49%), a fast 3-D forward is sufficient.

Times (glue-inclusive, marginal chained timing, same useful FLOPs):
  conv3d        (3,3,3)->64 stride 1          the native form
  conv3d_pack2  (4,3,3)->128 stride (2,1,1) + channel-pair unpack
  conv3d_pack4  (6,3,3)->256 stride (4,1,1) + unpack
  dfold         fold + 2-D conv (the current default, ~16.2 ms)

Usage: python scripts/bench_dpack3d.py [--d 160] [--hw 128] [--c 64]
         [--f 64] [--iters 20] [--reps 5] [--small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PEAK = 197e12


def make_packed_kernel(k, pack):
    """k: (3, kh, kw, C, F) -> (pack+2, kh, kw, C, pack*F) block-sparse."""
    import jax.numpy as jnp
    kd, kh, kw, c, f = k.shape
    w = jnp.zeros((pack + 2, kh, kw, c, pack * f), k.dtype)
    for p in range(pack):
        for dz in range(kd):
            w = w.at[p + dz, :, :, :, p * f:(p + 1) * f].set(k[dz])
    return w


def conv3d_pack(xp, k, pack):
    """xp: (B, D+2, H, W, C) depth-padded.  Returns (B, D, H, W, F)."""
    import jax
    import jax.numpy as jnp
    b, dp2, h, w, c = xp.shape
    d = dp2 - 2
    f = k.shape[-1]
    w3 = make_packed_kernel(k, pack)
    y = jax.lax.conv_general_dilated(
        xp, w3, (pack, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if pack == 1:
        return y
    y = y.reshape(b, d // pack, h, w, pack, f)
    y = jnp.transpose(y, (0, 1, 4, 2, 3, 5))
    return y.reshape(b, d, h, w, f)


def dfold_fwd(xp, k):
    import jax
    import jax.numpy as jnp
    b, dp2, h, w, c = xp.shape
    d = dp2 - 2
    kd, kh, kw, _, f = k.shape
    parts = [xp[:, i:i + d] for i in range(kd)]
    y = jnp.concatenate(parts, axis=-1).reshape(b * d, h, w, kd * c)
    w2 = jnp.transpose(k, (1, 2, 0, 3, 4)).reshape(kh, kw, kd * c, f)
    out = jax.lax.conv_general_dilated(
        y, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(b, d, h, w, f)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=160)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--f", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--forms", type=str,
                   default="conv3d,pack2,pack4,dfold")
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.d, ns.hw, ns.c, ns.f, ns.iters, ns.reps = 8, 16, 4, 4, 3, 2

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    global jnp_mod

    dt = jnp.float32 if ns.small else jnp.dtype(ns.dtype)
    rs = np.random.RandomState(0)
    d, hw, c, f = ns.d, ns.hw, ns.c, ns.f
    xp = jnp.asarray(rs.randn(1, d + 2, hw, hw, c), dt)
    k = jnp.asarray(rs.randn(3, 3, 3, c, f) * 0.05, dt)
    useful = 2 * d * hw * hw * 9 * (3 * c) * f

    forms = {}
    if "conv3d" in ns.forms:
        forms["conv3d (3,3,3)->64 s1"] = lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if "pack2" in ns.forms:
        forms["conv3d_pack2 (4,3,3)->128 s2"] = (
            lambda a, b: conv3d_pack(a, b, 2))
    if "pack4" in ns.forms:
        forms["conv3d_pack4 (6,3,3)->256 s4"] = (
            lambda a, b: conv3d_pack(a, b, 4))
    if "dfold" in ns.forms:
        forms["dfold fold+conv2d"] = dfold_fwd

    want = dfold_fwd(xp, k)
    for name, fn in forms.items():
        got = fn(xp, k)
        dmax = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                     - want.astype(jnp.float32))))
        print(f"parity {name}: max|delta|={dmax:.3e}", flush=True)

    def chained(fn, a_, b_):
        def g(a__, b__, kk):
            def body(_, carry):
                acc, aa = carry
                aa = aa + (acc * 1e-12).astype(aa.dtype)
                out = fn(aa, b__)
                return jnp.sum(out.astype(jnp.float32)), aa
            acc, _ = jax.lax.fori_loop(0, kk, body, (jnp.float32(0.0), a__))
            return acc
        jf = jax.jit(g, static_argnums=2)
        return lambda kk: jf(a_, b_, kk)

    print(f"\nuseful work {useful / 1e9:.0f} GFLOP; glue-inclusive forward:",
          flush=True)
    for name, fn in forms.items():
        try:
            run = chained(fn, xp, k)
            float(run(1)); float(run(1 + ns.iters))
            best = None
            for _ in range(ns.reps):
                t0 = time.perf_counter(); float(run(1))
                d1 = time.perf_counter() - t0
                t0 = time.perf_counter(); float(run(1 + ns.iters))
                dk = time.perf_counter() - t0
                ms = (dk - d1) / ns.iters * 1e3
                best = ms if best is None else min(best, ms)
            tf = useful / (best / 1e3)
            print(f"{name:<34} {best:>8.2f} ms  {tf / 1e12:>6.1f} TFLOP/s"
                  f"  {100 * tf / PEAK:>5.1f}% useful-MFU", flush=True)
        except Exception as e:
            print(f"{name:<34} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
