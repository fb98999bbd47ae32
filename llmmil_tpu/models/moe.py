"""Mixture-of-Experts FFN + expert parallelism (beyond reference).

The reference's TransMIL blocks are attention-only (``model/dim1/
TransMIL.py:8-28`` — TransLayer has no FFN), so this subsystem is a
flag-gated capability extension (``Config.moe_experts``, default 0 = off;
the param tree and numerics of every reference-parity config are
untouched).  When enabled, each TransLayer gains a pre-norm routed-FFN
residual block in the GShard/Switch pattern, shaped the TPU way:

- **Grouped dense dispatch** — tokens route via one-hot dispatch/combine
  einsums over fixed-size groups: no sorts, no dynamic shapes, everything
  is MXU-shaped matmul work under jit.  Group-local capacity keeps the
  one-hot tensors at O(n·e·c_g) instead of the ungrouped O(n·e·c) with
  c ∝ n — at the flagship's 16k-token bags that is ~40 MB vs ~1 TB.
- **Top-k routing with capacity** (k=2 default): router probs in fp32,
  per-group expert positions via cumsum, overflow tokens fall through to
  the residual path (deterministic, shape-static GShard semantics).
- **Load-balance aux loss** (Switch Transformer eq. 4: E·Σ_e f_e·p̄_e,
  ≈1.0 at a uniform router) sown into the 'moe' collection; the train
  step adds ``cfg.moe_aux_weight`` × the layer mean (train/step.py).
- **Expert parallelism**: the expert-major params (E, ...) shard dim 0
  over a named mesh axis (``parallel/ep.py`` — the same path-regex GSPMD
  annotation machinery as tensor parallelism); XLA's SPMD partitioner
  propagates the layout through the dispatch/expert/combine einsums and
  places the all-to-alls on ICI.  An EP train step matches the replicated
  step to float tolerance (tests/test_moe.py).

Masked (padding) tokens get zero router prob, so they are never
dispatched, consume no capacity, and receive a zero update (the residual
carries them through unchanged); with ``mask=None`` every token routes,
mirroring how the attention path treats its padding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MoESpec:
    """Hashable MoE hyperparameters (a flax-module attribute)."""
    experts: int
    hidden: int = 1024
    k: int = 2
    capacity_factor: float = 1.25
    group_size: int = 512


class MoEFFN(nn.Module):
    """Routed expert FFN: x (B, N, dim) -> (B, N, dim).

    Compute dtype follows ``dtype`` (bf16 in production — the expert
    matmuls and the one-hot dispatch/combine einsums all hit the MXU);
    the router runs in fp32 for softmax stability, params store fp32.
    """
    dim: int
    hidden: int
    n_experts: int
    k: int = 2
    capacity_factor: float = 1.25
    group_size: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        b, n, d = x.shape
        e = self.n_experts
        kk = min(self.k, e)
        g = min(self.group_size, n)
        pad = (g - n % g) % g
        valid = mask if mask is not None else jnp.ones((b, n), bool)
        xg = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        vg = jnp.pad(valid, ((0, 0), (0, pad)))
        n_groups = xg.shape[1] // g
        xg = xg.reshape(b * n_groups, g, d)
        vg = vg.reshape(b * n_groups, g).astype(jnp.float32)
        cap = max(1, int(math.ceil(self.capacity_factor * kk * g / e)))

        logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          name="router")(xg.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1) * vg[..., None]

        # top-k assignment with per-group capacity: k rounds of argmax,
        # positions by cumsum (all assignments count toward positions so
        # round-2 tokens stack after round-1 in each expert's buffer)
        combine = jnp.zeros((b * n_groups, g, e, cap), jnp.float32)
        counts = jnp.zeros((b * n_groups, e), jnp.float32)
        remaining = probs
        top1 = None
        for i in range(kk):
            gate = jnp.max(remaining, axis=-1)                   # (bG, g)
            sel = jax.nn.one_hot(jnp.argmax(remaining, axis=-1), e)
            sel = sel * (gate > 0)[..., None]
            if i == 0:
                top1 = sel
            pos = jnp.cumsum(sel, axis=1) - sel + counts[:, None, :]
            kept = sel * (pos < cap)
            slot = jnp.sum(pos * kept, axis=-1).astype(jnp.int32)
            combine = combine + (gate[..., None, None] * kept[..., None]
                                 * jax.nn.one_hot(slot, cap)[:, :, None, :])
            counts = counts + jnp.sum(sel, axis=1)
            remaining = remaining * (1.0 - sel)
        # renormalise the kept gates per token (GShard top-2 convention)
        denom = jnp.sum(combine, axis=(2, 3), keepdims=True)
        combine = combine / jnp.maximum(denom, 1e-9)

        dt = self.dtype
        dispatch = (combine > 0).astype(dt)
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (e, d, self.hidden), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, self.hidden),
                        jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (e, self.hidden, d), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)

        xs = jnp.einsum("gsec,gsd->egcd", dispatch, xg.astype(dt))
        h1 = jax.nn.relu(jnp.einsum("egcd,edh->egch", xs, w1.astype(dt))
                         + b1.astype(dt)[:, None, None])
        ys = (jnp.einsum("egch,ehd->egcd", h1, w2.astype(dt))
              + b2.astype(dt)[:, None, None])
        y = jnp.einsum("gsec,egcd->gsd", combine.astype(dt), ys)
        y = y.reshape(b, n + pad, d)[:, :n]

        # Switch load-balance loss over the call's valid tokens
        nv = jnp.maximum(jnp.sum(vg), 1.0)
        frac = jnp.sum(top1, axis=(0, 1)) / nv
        pbar = jnp.sum(probs, axis=(0, 1)) / nv
        self.sow("moe", "aux_loss", e * jnp.sum(frac * pbar))
        return y.astype(x.dtype)


def spec_from_config(cfg) -> Optional[MoESpec]:
    """MoESpec from Config's moe_* fields; None when off."""
    if not getattr(cfg, "moe_experts", 0):
        return None
    return MoESpec(experts=cfg.moe_experts, hidden=cfg.moe_hidden,
                   k=cfg.moe_k, capacity_factor=cfg.moe_capacity,
                   group_size=cfg.moe_group)
