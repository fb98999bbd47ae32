#!/usr/bin/env python
"""Pallas conv3x3 vs XLA at MC3-layer1 production shape, per-op, on-TPU.

VERDICT r2 #1 harness.  The dfold layer1 convs — (B·D=160, 128, 128, 192)
→ 64, 3×3 stride-1 — run at ~21-27% MFU under XLA's emitters (BENCH_NOTES
r2; the in-XLA lowerings are exhausted).  Each op is measured in
ISOLATION with marginal timing and a data-dependent operand (K chained
iterations in one jit vs 1, scalar-fetch fenced) so XLA cannot hoist the
op out of the loop:

  fwd    y  = conv(x, w)                 (N,H,W,C)→F
  dgrad  dx = conv(g, rot(w))            (N,H,W,F)→C   (the vjp wrt x)
  wgrad  dw = Σ patchesᵀ(x)·g            → (3,3,C,F)   (the vjp wrt w)

XLA rows use the REAL gradient emitters (jax.vjp of the reference conv);
pallas rows are the ops/pallas/conv3x3 kernels ('taps' = 9 tap GEMMs,
'patch' = one long-K GEMM over a VMEM im2col block).

Usage: python scripts/bench_conv3x3.py [--n 160] [--hw 128] [--c 192]
         [--f 64] [--iters 20] [--reps 5] [--block-h 8,16] [--small]
"""

import argparse
import functools
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
    p.add_argument("--modes", type=str, default="taps,patch,tout")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--ops", type=str, default="fwd,dgrad,wgrad")
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.n, ns.hw, ns.c, ns.f, ns.iters, ns.reps = 4, 32, 16, 8, 3, 2

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.ops.pallas.conv3x3 import (_conv_fwd, _conv_wgrad,
                                               conv3x3_reference)

    dt = jnp.dtype(ns.dtype) if not ns.small else jnp.float32
    interp = bool(ns.small)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(ns.n, ns.hw, ns.hw, ns.c), dt)
    w = jnp.asarray(rs.randn(3, 3, ns.c, ns.f) * 0.05, dt)
    g = jnp.asarray(rs.randn(ns.n, ns.hw, ns.hw, ns.f), dt)
    w_rot = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    flops = 2 * ns.n * ns.hw * ns.hw * 9 * ns.c * ns.f

    def chained(fn, a, b):
        """K iterations of out = fn(a, b) with a data-dependent on out."""
        def f(a, b, k):
            def body(_, carry):
                acc, aa = carry
                aa = aa + (acc * 1e-12).astype(aa.dtype)
                out = fn(aa, b)
                return jnp.sum(out.astype(jnp.float32)), aa
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), a))
            return acc
        jf = jax.jit(f, static_argnums=2)
        return lambda k: jf(a, b, k)

    def time_marginal(run, label):
        try:
            float(run(1))
            float(run(1 + ns.iters))
            best = None
            for _ in range(ns.reps):
                t0 = time.perf_counter()
                float(run(1))
                d1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(run(1 + ns.iters))
                dk = time.perf_counter() - t0
                ms = (dk - d1) / ns.iters * 1e3
                best = ms if best is None else min(best, ms)
            tf = flops / (best / 1e3)
            print(f"{label:<26} {best:>8.2f} ms  {tf / 1e12:>6.1f} TFLOP/s"
                  f"  {100 * tf / PEAK:>5.1f}% MFU", flush=True)
        except Exception as e:
            print(f"{label:<26} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # XLA gradient emitters via vjp (zeros primal: dgrad/wgrad don't read it)
    def dx_xla(g_, w_):
        _, vjp = jax.vjp(
            lambda x_: conv3x3_reference(x_, w_), jnp.zeros_like(x))
        return vjp(g_)[0]

    def dw_xla(g_, x_):
        _, vjp = jax.vjp(
            lambda w_: conv3x3_reference(x_, w_), jnp.zeros_like(w))
        return vjp(g_)[0]

    bhs = [int(b) for b in ns.block_h.split(",")]
    modes = ns.modes.split(",")
    ops = ns.ops.split(",")

    # parity on-device (fwd + both pallas grads vs the XLA emitters)
    want = conv3x3_reference(x, w)
    wantdx = dx_xla(g, w)
    wantdw = dw_xla(g, x)
    for mode in modes:
        got = _conv_fwd(x, w, block_h=bhs[0], interpret=interp, mode=mode)
        d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                  - want.astype(jnp.float32))))
        gdx = _conv_fwd(g, w_rot, block_h=bhs[0], interpret=interp,
                        mode=mode)
        ddx = float(jnp.max(jnp.abs(gdx.astype(jnp.float32)
                                    - wantdx.astype(jnp.float32))))
        print(f"parity {mode}: fwd max|Δ|={d:.3e} dx max|Δ|={ddx:.3e}",
              flush=True)
    for wm in ("taps", "tout"):
        gdw = _conv_wgrad(x, g, block_h=bhs[0], interpret=interp, mode=wm)
        rel = float(jnp.max(jnp.abs(gdw - wantdw.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(wantdw.astype(jnp.float32))) + 1e-9))
        print(f"parity wgrad {wm}: max relΔ={rel:.3e}", flush=True)

    print(f"\nshape ({ns.n},{ns.hw},{ns.hw},{ns.c})→{ns.f} {dt}, "
          f"{flops / 1e9:.0f} GFLOP/op")
    if "fwd" in ops:
        time_marginal(chained(conv3x3_reference, x, w), "xla fwd")
    if "dgrad" in ops:
        time_marginal(chained(dx_xla, g, w), "xla dgrad")
    if "wgrad" in ops:
        time_marginal(chained(dw_xla, g, x), "xla wgrad")
    for mode in modes:
        for bh in bhs:
            if "fwd" in ops:
                fwd = functools.partial(_conv_fwd, block_h=bh,
                                        interpret=interp, mode=mode)
                time_marginal(chained(fwd, x, w),
                              f"pallas fwd {mode} bh={bh}")
            if "dgrad" in ops:
                dg = functools.partial(_conv_fwd, block_h=bh,
                                       interpret=interp, mode=mode)
                time_marginal(chained(dg, g, w_rot),
                              f"pallas dgrad {mode} bh={bh}")
    if "wgrad" in ops:
        for wm in ("taps", "tout"):
            for bh in bhs:
                wg = functools.partial(
                    lambda g_, x_, bh=bh, wm=wm: _conv_wgrad(
                        x_, g_, block_h=bh, interpret=interp, mode=wm))
                time_marginal(chained(wg, g, x),
                              f"pallas wgrad {wm} bh={bh}")


if __name__ == "__main__":
    main()
