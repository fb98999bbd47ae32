#!/usr/bin/env python
"""dpack2 experiment: pack 2 adjacent depth outputs into conv channels.

The round-3 per-op ruling (BENCH_NOTES) left ONE asymmetry unexplained:
at MC3-layer1's dfold shape (160,128,128,192)->64 the forward runs at
26.7% MFU (cout=64 half-fills the MXU's 128 lanes) while the gradient
emitters run 45-49%.  The measured emitter law is "efficiency tracks
cout" (64->21-27%, 128->47%, 512->82%).  dshift widened cout but paid kD
full slab passes and lost (BENCH_NOTES r2 ruling).

dpack2 widens cout WITHOUT slab passes: compute output depth-slices in
pairs.  The pair (2t, 2t+1) reads input slices [2t-1 .. 2t+2] — a
4-slice window — so fold the window on channels (cin 4C) and stack the
pair on cout (2F).  The packed weight is block-sparse (6 of 8 CxF blocks
live -> 4/3 useful-FLOP overhead), but runs at the cout-128 efficiency:
predicted 47%*3/4 = 35% effective vs 26.7% = ~1.3x.  Grads stay on the
stock dfold emitters (already 45-49%) via custom_vjp — this experiment
times FORWARD lowerings only.

Measures (marginal chained timing, scalar-fetch fenced, like
scripts/bench_conv3x3.py):
  raw conv law      (N,HW,C)->F at the baseline / pack2 / pack4 shapes
  glue-inclusive    dfold fwd vs dpack2 fwd (window fold + conv + unpack)
  parity            dpack2 == dfold to bf16 ulps

Usage: python scripts/bench_dpack.py [--d 160] [--hw 128] [--c 64]
         [--f 64] [--iters 20] [--reps 5] [--small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PEAK = 197e12


def dpack2_fwd(xp, k):
    """Packed-pair forward.  xp: (B, D+2, H, W, C) depth-padded input,
    k: (3, kh, kw, C, F).  Returns (B, D, H, W, F), D even."""
    import jax.numpy as jnp
    b, dp2, h, w, c = xp.shape
    d = dp2 - 2
    kd, kh, kw, _, f = k.shape
    parts = [xp[:, j:j + d:2] for j in range(4)]        # each (B, D/2, ...)
    xw = jnp.concatenate(parts, axis=-1)                # (B, D/2, H, W, 4C)
    xw = xw.reshape(b * (d // 2), h, w, 4 * c)
    w2 = jnp.zeros((kh, kw, 4 * c, 2 * f), k.dtype)
    for p in range(2):
        for dz in range(kd):
            j = p + dz
            w2 = w2.at[:, :, j * c:(j + 1) * c, p * f:(p + 1) * f].set(k[dz])
    import jax
    y2 = jax.lax.conv_general_dilated(
        xw, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))     # (B*D/2, H, W, 2F)
    y2 = y2.reshape(b, d // 2, h, w, 2, f)
    y2 = jnp.transpose(y2, (0, 1, 4, 2, 3, 5))
    return y2.reshape(b, d, h, w, f)


def dfold_fwd(xp, k):
    """Stock dfold forward (models/ct_mc3.py mode='dfold', stride 1)."""
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
    p.add_argument("--skip-raw", action="store_true")
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.d, ns.hw, ns.c, ns.f, ns.iters, ns.reps = 8, 16, 4, 4, 3, 2

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    dt = jnp.float32 if ns.small else jnp.dtype(ns.dtype)
    rs = np.random.RandomState(0)
    d, hw, c, f = ns.d, ns.hw, ns.c, ns.f
    xp = jnp.asarray(rs.randn(1, d + 2, hw, hw, c), dt)
    k = jnp.asarray(rs.randn(3, 3, 3, c, f) * 0.05, dt)
    useful = 2 * d * hw * hw * 9 * (3 * c) * f   # dfold FLOPs = useful work

    # parity first (fp32 on CPU for --small, bf16 on device otherwise)
    a = dfold_fwd(xp, k)
    bb = dpack2_fwd(xp, k)
    dmax = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - bb.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
    print(f"parity dpack2 vs dfold: max|delta|={dmax:.3e} (max|y|={ref:.3e})",
          flush=True)

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

    def time_marginal(run, label, flops):
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
        print(f"{label:<34} {best:>8.2f} ms  {tf / 1e12:>6.1f} TFLOP/s"
              f"  {100 * tf / PEAK:>5.1f}% useful-MFU", flush=True)
        return best

    if not ns.skip_raw:
        # raw conv emitter law at the three packing levels (per-op truth)
        print("\nraw conv emitter law (same useful output volume each row):",
              flush=True)
        for pack, lbl in ((1, "pack1 (dfold shape)"),
                          (2, "pack2"), (4, "pack4")):
            n2, c2, f2 = d // pack, (pack + 2) * c, pack * f
            x2 = jnp.asarray(rs.randn(n2, hw, hw, c2), dt)
            w2 = jnp.asarray(rs.randn(3, 3, c2, f2) * 0.05, dt)

            def cv(a_, b_):
                return jax.lax.conv_general_dilated(
                    a_, b_, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            raw = 2 * n2 * hw * hw * 9 * c2 * f2
            ms = time_marginal(chained(cv, x2, w2),
                               f"conv ({n2},{hw},{hw},{c2})->{f2}", useful)
            eff = raw / (ms / 1e3) / PEAK
            print(f"{'':<34} raw-MFU {100 * eff:5.1f}%  "
                  f"(overhead x{raw / useful:.2f})", flush=True)

    print("\nglue-inclusive forward lowerings:", flush=True)
    time_marginal(chained(dfold_fwd, xp, k), "dfold fwd (fold+conv)", useful)
    time_marginal(chained(dpack2_fwd, xp, k),
                  "dpack2 fwd (fold+conv+unpack)", useful)


if __name__ == "__main__":
    main()
