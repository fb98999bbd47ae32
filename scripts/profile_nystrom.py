#!/usr/bin/env python
"""Attribute the Nyström-attention backward (the non-CT hotspot).

profile_transmil (r3) put NystromSelfAttention grad at 23.9 ms/layer,
3.9% MFU — ~the whole TransMIL backward.  This times the op-level
nystrom_attention fwd/grad under ablations at production shape
(B=1, H=8, N=16128, dh=64, m=256, bf16):

  full       the real op
  nopinv     pinv replaced by identity (isolates the Moore–Penrose cost)
  nosoftmax  raw sims in place of the three softmaxes (isolates softmax)
  fp32pinv   pinv iterations in fp32 (dtype sensitivity)

Usage: python scripts/profile_nystrom.py [--n 16128] [--iters 20] [--small]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16128)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dh", type=int, default=64)
    p.add_argument("--m", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--small", action="store_true")
    ns = p.parse_args(argv)
    if ns.small:
        ns.n, ns.m, ns.iters, ns.reps = 512, 64, 2, 1

    import jax
    if ns.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from llmmil_tpu.ops.masked import masked_softmax, \
        segment_mean_landmarks
    from llmmil_tpu.ops.nystrom import moore_penrose_pinv

    dt = jnp.bfloat16 if not ns.small else jnp.float32
    rs = np.random.RandomState(0)
    B, H, N, Dh, M = 1, ns.heads, ns.n, ns.dh, ns.m
    q = jnp.asarray(rs.randn(B, H, N, Dh), dt)
    k = jnp.asarray(rs.randn(B, H, N, Dh), dt)
    v = jnp.asarray(rs.randn(B, H, N, Dh), dt)

    def attention(q, k, v, pinv="bf16", softmax=True):
        scale = Dh ** -0.5
        q = q * scale
        q_l = segment_mean_landmarks(q, M)
        k_l = segment_mean_landmarks(k, M)
        sim1 = q @ jnp.swapaxes(k_l, -1, -2)
        sim2 = q_l @ jnp.swapaxes(k_l, -1, -2)
        sim3 = q_l @ jnp.swapaxes(k, -1, -2)
        if softmax:
            a1 = masked_softmax(sim1, None)
            a2 = masked_softmax(sim2, None)
            a3 = masked_softmax(sim3, None)
        else:
            a1, a2, a3 = sim1 * 1e-2, sim2 * 1e-2, sim3 * 1e-2
        if pinv == "none":
            a2i = a2
        elif pinv == "fp32":
            a2i = moore_penrose_pinv(a2.astype(jnp.float32), 6).astype(dt)
        else:
            a2i = moore_penrose_pinv(a2, 6)
        return (a1 @ a2i) @ (a3 @ v)

    variants = [
        ("full", dict()),
        ("nopinv", dict(pinv="none")),
        ("nosoftmax", dict(softmax=False)),
        ("fp32pinv", dict(pinv="fp32")),
    ]
    print(f"{'variant':<10} {'prog':<5} {'ms':>8}")
    for name, kw in variants:
        def fwd(q_, k_, v_):
            return jnp.sum(attention(q_, k_, v_, **kw)
                           .astype(jnp.float32))

        def grad(q_, k_, v_):
            gs = jax.grad(fwd, argnums=(0, 1, 2))(q_, k_, v_)
            return sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                       for g in gs)

        for pname, fn in (("fwd", fwd), ("grad", grad)):
            jf = jax.jit(fn)
            float(jf(q, k, v))

            def run(kk):
                t0 = time.perf_counter()
                o = None
                for _ in range(kk):
                    o = jf(q, k, v)
                float(o)
                return time.perf_counter() - t0

            run(1)
            best = None
            for _ in range(ns.reps):
                d1 = run(1)
                dk = run(1 + ns.iters)
                ms = (dk - d1) / ns.iters * 1e3
                best = ms if best is None else min(best, ms)
            print(f"{name:<10} {pname:<5} {best:>8.2f}", flush=True)


if __name__ == "__main__":
    main()
