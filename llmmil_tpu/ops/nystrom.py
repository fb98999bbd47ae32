"""Nyström attention (Xiong et al. 2021) as a pure JAX function.

Replaces the reference's external ``nystrom_attention`` dependency
(``model/dim1/TransMIL.py:13-21``) with the same math, mask-aware:

    q~ , k~  = segment means of q, k over m landmark groups
    F = softmax(q k~ᵀ)        (N, m)
    A = softmax(q~ k~ᵀ)       (m, m)
    B = softmax(q~ kᵀ)        (m, N)
    out = F @ pinv(A) @ (B @ v)

with ``pinv`` the iterative Moore–Penrose approximation and an optional
residual depthwise conv over values.  O(N·m) instead of O(N²) — the token
streams here are ~15k-long pathology bags, so this is the long-context
strategy (SURVEY.md §5).  All matmuls are MXU-shaped (landmarks default 256).
"""

from __future__ import annotations

import jax.numpy as jnp

from .dynquant import attn_dot
from jax import lax

from .masked import masked_softmax, segment_mean_landmarks


def moore_penrose_pinv(a: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Iterative Moore–Penrose pseudoinverse of (..., m, m) matrices.

    Razavi et al. iteration: z₀ = aᵀ/(‖a‖₁‖a‖∞);
    z ← ¼ z (13 I − a z (15 I − a z (7 I − a z))).
    """
    abs_a = jnp.abs(a)
    col = jnp.max(jnp.sum(abs_a, axis=-2), axis=-1)  # max col sum = ||a||_1
    row = jnp.max(jnp.sum(abs_a, axis=-1), axis=-1)  # max row sum = ||a||_inf
    z = jnp.swapaxes(a, -1, -2) / jnp.maximum(
        col * row, 1e-30)[..., None, None]
    m = a.shape[-1]
    eye = jnp.eye(m, dtype=a.dtype)

    # unrolled: iters is static and tiny (6 × three (m, m) matmuls), and a
    # fori_loop here reverse-differentiates as a scan whose per-iteration
    # residual stacking + serial launch overhead dominated the Nyström
    # backward (profiled r3 — scripts/profile_nystrom.py)
    for _ in range(iters):
        az = a @ z
        z = 0.25 * z @ (13.0 * eye - az @ (15.0 * eye
                                           - az @ (7.0 * eye - az)))
    return z


def nystrom_attention(q, k, v, num_landmarks: int = 256,
                      pinv_iterations: int = 6,
                      mask=None, return_attn: bool = False):
    """q, k, v: (B, H, N, Dh); mask: (B, N) bool or None.

    N must be divisible by ``num_landmarks`` (callers pad; TransMIL's
    square-padding guarantees it after the module-level front-pad).
    Returns (out, attn?) with out (B, H, N, Dh).
    """
    b, h, n, dh = q.shape
    scale = dh ** -0.5
    q = q * scale

    lm_mask = None
    sm_mask = None
    if mask is not None:
        sm_mask = mask[:, None, None, :]           # (B,1,1,N) over keys
        lm_mask = mask[:, None, :]                  # (B,1,N) for landmark means

    q_l = segment_mean_landmarks(q, num_landmarks, lm_mask)   # (B,H,m,Dh)
    k_l = segment_mean_landmarks(k, num_landmarks, lm_mask)

    # attn_dot: plain matmuls by default; under dynamic_int8_attention()
    # (serving only) the N-major products take the two-sided dynamic-int8
    # MXU path (ops/dynquant).  sim2 and the pinv chain stay float: (m,m)
    # work is negligible and the iterative pinv amplifies rounding.
    sim1 = attn_dot(q, jnp.swapaxes(k_l, -1, -2), kind="score")       # (B,H,N,m)
    sim2 = q_l @ jnp.swapaxes(k_l, -1, -2)     # (B,H,m,m)
    sim3 = attn_dot(q_l, jnp.swapaxes(k, -1, -2), kind="score")       # (B,H,m,N)

    attn1 = masked_softmax(sim1, None, axis=-1)            # landmarks all valid
    attn2 = masked_softmax(sim2, None, axis=-1)
    attn3 = masked_softmax(sim3, sm_mask, axis=-1)          # keys masked

    attn2_inv = moore_penrose_pinv(attn2, pinv_iterations)
    from .dynquant import dynamic_int8_enabled
    if dynamic_int8_enabled() and not return_attn:
        # Reassociated chain (matrix associativity): never forms the
        # (N, m)·(m, m) product — 3× fewer N-major flops at m=256 ≫
        # Dh=64, and that product was the int8 drift driver (pinv
        # outputs cancel heavily, so its per-element error is large
        # RELATIVE to the cancelled result).  Both remaining N-major
        # products have a softmax-bounded left operand → benign int8.
        y = attn_dot(attn3, v)                              # (B,H,m,Dh)
        y = attn2_inv.astype(y.dtype) @ y                   # small, exact
        return attn_dot(attn1, y), None                     # (B,H,N,Dh)
    left = attn_dot(attn1, attn2_inv)                       # (B,H,N,m)
    out = attn_dot(left, attn_dot(attn3, v))                # (B,H,N,Dh)

    if return_attn:
        # Factored form (left (B,H,N,m), right (B,H,m,N)): the full product
        # is (B,H,N,N) — ~2 TiB at the 16k-instance production bag — so rows
        # are reconstructed on demand (nystrom_attn_rows / _full below).
        return out, (left, attn3)
    return out, None


def nystrom_attn_rows(factors, rows) -> jnp.ndarray:
    """Reconstruct selected attention rows from the factored map.

    factors: (left (B,H,N,m), right (B,H,m,N)); rows: int or index array.
    Returns (B, H, len(rows), N) — e.g. ``rows=0`` for the cls-token
    saliency row without ever forming the (N, N) product.
    """
    left, right = factors
    idx = jnp.atleast_1d(jnp.asarray(rows))
    return left[:, :, idx, :] @ right


def nystrom_attn_full(factors) -> jnp.ndarray:
    """Materialise the full (B, H, N, N) map — small N only (tests)."""
    left, right = factors
    return left @ right
