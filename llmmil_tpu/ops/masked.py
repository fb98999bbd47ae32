"""Masked reductions for variable-length instance bags.

The reference zero-pads pathology bags to a fixed length with **no** attention
mask (``dataset.py:383-391``), so padded rows leak into every softmax.  Here
every op takes an optional boolean ``mask`` (True = valid).  ``mask=None``
reproduces the reference's unmasked numerics exactly, which the parity tests
rely on.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG_INF = -1e30


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray | None,
                   axis: int = -1) -> jnp.ndarray:
    """Numerically-stable softmax ignoring masked positions.

    ``mask`` broadcasts against ``logits``; masked positions get probability
    exactly 0 (all-masked slices return all-zero, not NaN).
    """
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    m = jnp.max(logits, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(logits - m)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None,
                axis: int = -2) -> jnp.ndarray:
    """Mean over ``axis`` counting only valid rows."""
    if mask is None:
        return jnp.mean(x, axis=axis)
    mask = jnp.broadcast_to(jnp.expand_dims(mask, -1), x.shape)
    num = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    den = jnp.maximum(jnp.sum(mask, axis=axis), 1)
    return num / den


def segment_mean_landmarks(x: jnp.ndarray, num_landmarks: int,
                           mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Landmark means for Nyström attention: split N tokens into
    ``num_landmarks`` contiguous segments and mean each (masked-aware).

    x: (..., N, D) with N divisible by num_landmarks.  Returns
    (..., num_landmarks, D).
    """
    *lead, n, d = x.shape
    seg = n // num_landmarks
    xs = x.reshape(*lead, num_landmarks, seg, d)
    if mask is None:
        return xs.mean(axis=-2)
    ms = jnp.broadcast_to(mask, (*lead, n)).reshape(
        *lead, num_landmarks, seg, 1)
    num = jnp.sum(jnp.where(ms, xs, 0.0), axis=-2)
    den = jnp.maximum(jnp.sum(ms, axis=-2), 1.0)
    return num / den
