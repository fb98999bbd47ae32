#!/usr/bin/env python
"""Micro-benchmark: fused Pallas MIL pooling vs the XLA-fused path, on-TPU.

VERDICT r1 #4 ruling harness.  Marginal timing (K data-dependent iterations
chained inside one jit vs 1, scalar-fetch fenced — BENCH_NOTES methodology)
at the production shape 8 bags × 16384 × 768, bf16.

Usage: python scripts/bench_milpool.py [--bags 8] [--n 16384] [--l 768]
         [--iters 30] [--blocks 512,1024,2048] [--dtype bfloat16]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bags", type=int, default=8)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--l", type=int, default=768)
    p.add_argument("--d", type=int, default=192)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--blocks", type=str, default="512,1024,2048")
    p.add_argument("--dtype", type=str, default="bfloat16")
    ns = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from llmmil_tpu.ops.pallas.mil_pool import mil_pool, mil_pool_reference

    dt = jnp.dtype(ns.dtype)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(ns.bags, ns.n, ns.l), dt)
    mask = jnp.asarray(
        np.arange(ns.n)[None] < rs.randint(ns.n // 2, ns.n, (ns.bags, 1)))
    params = [jnp.asarray(rs.randn(ns.l, ns.d) * 0.05, jnp.float32),
              jnp.zeros((ns.d,), jnp.float32),
              jnp.asarray(rs.randn(ns.l, ns.d) * 0.05, jnp.float32),
              jnp.zeros((ns.d,), jnp.float32),
              jnp.asarray(rs.randn(ns.d, 1) * 0.05, jnp.float32),
              jnp.zeros((1,), jnp.float32)]

    def chained(pool_fn, k):
        def f(x, mask):
            def body(_, carry):
                acc, xx = carry
                xx = xx + (acc * 1e-12).astype(xx.dtype)
                pooled, _ = pool_fn(xx, mask)
                return pooled.astype(jnp.float32).sum(), xx
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), x))
            return acc
        return jax.jit(f)

    def measure(pool_fn, name):
        f1, fk = chained(pool_fn, 1), chained(pool_fn, 1 + ns.iters)
        try:
            float(f1(x, mask)); float(fk(x, mask))       # compile + warm
        except Exception as e:
            print(f"{name:<28} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            return None
        best = []
        for _ in range(ns.reps):
            t0 = time.perf_counter(); float(f1(x, mask))
            d1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fk(x, mask))
            dk = time.perf_counter() - t0
            best.append((dk - d1) / ns.iters * 1e3)
        ms = float(np.median(best))
        print(f"{name:<28} {ms:8.3f} ms/iter  "
              f"(spread {max(best) / max(min(best), 1e-9):.2f}x)", flush=True)
        return ms

    print(f"shape: {ns.bags}x{ns.n}x{ns.l} {ns.dtype}, D={ns.d}", flush=True)
    # correctness gate: kernel vs reference on this hardware
    ref_p, _ = jax.jit(lambda: mil_pool_reference(x, mask, *params))()
    ker_p, _ = jax.jit(lambda: mil_pool(x, mask, *params, 512, False))()
    err = float(jnp.max(jnp.abs(ref_p - ker_p))
                / jnp.maximum(jnp.max(jnp.abs(ref_p)), 1e-9))
    print(f"kernel vs reference max rel err: {err:.2e}", flush=True)
    assert err < (5e-2 if dt == jnp.bfloat16 else 1e-5), err

    xla_ref = lambda xx, mm: mil_pool_reference(xx, mm, *params)
    # XLA in the model's own mixed precision (ABMIL path: x/wv in compute
    # dtype, gate product fp32) — cast everything to the bag dtype:
    cast = [q.astype(dt) if q.ndim == 2 else q for q in params]
    xla_cd = lambda xx, mm: mil_pool_reference(xx, mm, *cast)
    measure(xla_ref, "XLA fp32-weights")
    measure(xla_cd, f"XLA {ns.dtype}-weights")
    for blk in [int(b) for b in ns.blocks.split(",")]:
        measure(functools.partial(
            lambda xx, mm, b: mil_pool(xx, mm, *params, b, False), b=blk),
            f"pallas block_n={blk}")


if __name__ == "__main__":
    main()
