"""Gated-attention MIL aggregators (batched + mask-aware).

Parity targets: ``model/dim1/ABMIL.py:6-64`` and ``ABMIL_v2.py:49-68``.
The reference squeezes the batch dim and processes one bag at a time; here
bags are batched (B, N, L) with an optional validity mask so padded rows get
zero attention (the reference's unmasked numerics are reproduced by
``mask=None``).

Two execution paths over the SAME parameters:
- plain JAX (``llmmil_tpu.ops.mil.gated_attention_pool``) — CPU / parity;
- the fused Pallas kernel (``llmmil_tpu.ops.pallas.mil_pool``) when
  ``use_pallas`` and a mask is present — streams the bag HBM→VMEM once per
  pass instead of materialising (N, D) gate activations.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.mil import gated_attention_logits, gated_attention_pool
from ..ops.pallas import mil_pool

NEG_INF = -1e30


class ABMIL(nn.Module):
    """A = w(tanh(Vx) ⊙ σ(Ux)); M = softmax(A)ᵀ x.

    Returns (M, A): pooled (B, K, L) features and (B, K, N) attention.

    ``shard_axis``: mesh axis name sharding the INSTANCE axis (inside a
    ``shard_map``) — the softmax runs as the cross-shard two-pass
    (pmax → psum over ICI, ``parallel/sp_mil.py``'s schedule), exact vs
    the single-device pool; the returned attention covers the LOCAL
    instance shard.  This makes million-instance bags trainable across
    chips — the reference is single-device by construction (SURVEY §5).
    """
    L: int = 768
    D: int = 192
    K: int = 1
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    shard_axis: str | None = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        l = x.shape[-1]
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        wv = self.param("V_kernel", init, (l, self.D))
        bv = self.param("V_bias", zeros, (self.D,))
        wu = self.param("U_kernel", init, (l, self.D))
        bu = self.param("U_bias", zeros, (self.D,))
        ww = self.param("w_kernel", init, (self.D, self.K))
        bw = self.param("w_bias", zeros, (self.K,))

        if self.shard_axis is not None and self.K != 1:
            raise ValueError(
                "ABMIL shard_axis requires K == 1: the cross-shard "
                "two-pass softmax is single-head, and falling through to "
                "the unsharded pool inside shard_map would compute a "
                "per-shard-normalized softmax")
        drop_rng = None
        if self.shard_axis is not None and train and self.dropout > 0.0:
            # inside shard_map the 'dropout' rng is replicated across the
            # instance shards; fold the shard index in so each shard draws
            # an independent mask (matching the unsharded model's i.i.d.
            # dropout over all N instances)
            drop_rng = jax.random.fold_in(
                self.make_rng("dropout"),
                jax.lax.axis_index(self.shard_axis))
        x = nn.Dropout(self.dropout, deterministic=not train)(x, rng=drop_rng)
        if self.shard_axis is not None:
            xd = x.astype(self.dtype)
            m = (mask if mask is not None
                 else jnp.ones(x.shape[:2], bool))
            xz = jnp.where(m[..., None], xd, 0.0)
            a = gated_attention_logits(xz, wv.astype(self.dtype), bv,
                                       wu, bu, ww, bw)[..., 0]   # (B, Nl)
            a = jnp.where(m, a, NEG_INF)
            # softmax is shift-invariant: the global max needs no gradient
            gmax = jax.lax.pmax(
                jax.lax.stop_gradient(jnp.max(a, axis=1)), self.shard_axis)
            e = jnp.where(m, jnp.exp(a - gmax[:, None]), 0.0)
            s = jax.lax.psum(jnp.sum(e, axis=1), self.shard_axis)
            num = jax.lax.psum(jnp.einsum("bn,bnl->bl", e, xz),
                               self.shard_axis)
            denom = jnp.maximum(s, 1e-30)[:, None]
            return (num / denom)[:, None, :], (e / denom)[:, None, :]
        if self.use_pallas and mask is not None and self.K == 1:
            # feed the kernel the compute dtype (bf16 on TPU): its gate
            # GEMMs run at the MXU's native rate in the bag's dtype
            pooled, att = mil_pool(x.astype(self.dtype), mask,
                                   wv, bv, wu, bu, ww, bw)
            return pooled[:, None, :].astype(x.dtype), att[:, None, :]
        pooled, att = gated_attention_pool(
            x.astype(self.dtype), wv.astype(self.dtype), bv, wu, bu, ww, bw,
            mask=mask)
        return pooled, att


class ABMILv2(nn.Module):
    """ABMIL + Biopsy/Resection class scalar concat (ABMIL_v2.py:49-68).

    ``bprc``: (B, 1) float scalar (0 = Biopsy, 1 = Resection) appended to the
    pooled feature → (B, K, L+1).
    """
    L: int = 768
    D: int = 192
    K: int = 1
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, bprc, mask=None, train: bool = False):
        pooled, att = ABMIL(self.L, self.D, self.K, self.dropout,
                            self.dtype, self.use_pallas,
                            name="abmil")(x, mask, train)
        bprc = jnp.broadcast_to(
            bprc[..., None, :].astype(pooled.dtype),
            (*pooled.shape[:-1], 1))
        return jnp.concatenate([pooled, bprc], axis=-1), att
