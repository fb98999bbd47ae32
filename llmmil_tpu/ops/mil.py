"""Gated-attention MIL pooling (Ilse et al.) as pure functions.

Math (reference ``model/dim1/ABMIL.py:47-59``):
    A_V = tanh(x @ Wv + bv)            # (N, D)
    A_U = sigmoid(x @ Wu + bu)         # (N, D)
    a   = (A_V * A_U) @ Ww + bw        # (N, K)
    A   = softmax(a over N)            # (K, N)
    M   = A @ x                        # (K, L)

The reference runs this one bag at a time with no mask.  Here it is batched
over bags and mask-aware; ``mask=None`` matches the reference exactly.  The
fused Pallas kernel in ``llmmil_tpu.ops.pallas.mil_pool`` computes the same
function without materialising the (N, D) gate activations in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .masked import masked_softmax


def gated_attention_logits(x, wv, bv, wu, bu, ww, bw):
    """Per-instance attention logits. x: (..., N, L) -> (..., N, K)."""
    a_v = jnp.tanh(x @ wv + bv)
    a_u = jax.nn.sigmoid(x @ wu + bu)
    return (a_v * a_u) @ ww + bw


def gated_attention_pool(x, wv, bv, wu, bu, ww, bw, mask=None):
    """Batched gated-attention pooling.

    x: (..., N, L); mask: (..., N) bool or None.
    Returns (M, A): pooled (..., K, L) and attention (..., K, N).
    """
    if mask is not None:
        # zero masked rows *values* too: a zero attention weight alone does
        # not stop non-finite padding values (0·NaN = NaN) from poisoning
        # the pooling matmul
        x = jnp.where(mask[..., None], x, 0.0)
    a = gated_attention_logits(x, wv, bv, wu, bu, ww, bw)  # (..., N, K)
    a = jnp.swapaxes(a, -1, -2)                            # (..., K, N)
    m = mask[..., None, :] if mask is not None else None
    A = masked_softmax(a, m, axis=-1)
    M = A @ x                                              # (..., K, L)
    return M, A
