"""Gated-attention MIL aggregators (batched + mask-aware).

Parity targets: ``model/dim1/ABMIL.py:6-64`` and ``ABMIL_v2.py:49-68``.
The reference squeezes the batch dim and processes one bag at a time; here
bags are batched (B, N, L) with an optional validity mask so padded rows get
zero attention (the reference's unmasked numerics are reproduced by
``mask=None``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masked import masked_softmax


class ABMIL(nn.Module):
    """A = w(tanh(Vx) ⊙ σ(Ux)); M = softmax(A)ᵀ x.

    Returns (M, A): pooled (B, K, L) features and (B, K, N) attention.
    """
    L: int = 768
    D: int = 192
    K: int = 1
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if mask is not None:
            # zero masked values: a zero attention weight alone doesn't stop
            # non-finite padding (0·NaN = NaN) entering the pooling matmul
            x = jnp.where(mask[..., None], x, 0.0)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        a_v = jnp.tanh(nn.Dense(self.D, dtype=self.dtype,
                                name="attention_V")(x))       # (B,N,D)
        a_u = nn.sigmoid(nn.Dense(self.D, dtype=self.dtype,
                                  name="attention_U")(x))     # (B,N,D)
        a = nn.Dense(self.K, dtype=self.dtype,
                     name="attention_weights")(a_v * a_u)     # (B,N,K)
        a = jnp.swapaxes(a, -1, -2)                           # (B,K,N)
        m = mask[..., None, :] if mask is not None else None
        att = masked_softmax(a, m, axis=-1)
        pooled = att @ x                                       # (B,K,L)
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

    @nn.compact
    def __call__(self, x, bprc, mask=None, train: bool = False):
        pooled, att = ABMIL(self.L, self.D, self.K, self.dropout,
                            self.dtype, name="abmil")(x, mask, train)
        bprc = jnp.broadcast_to(
            bprc[..., None, :].astype(pooled.dtype),
            (*pooled.shape[:-1], 1))
        return jnp.concatenate([pooled, bprc], axis=-1), att
