"""Two-sided DYNAMIC int8 for activation×activation matmuls (serving).

The non-CT Dense stack is already served int8 via per-site PTQ
(``eval/quant_nonct.py`` — one static activation scale per Dense).  What
that cannot touch is the attention score/value products and the Nyström
chain (``model/sam/transformer.py:395-449``, ``model/dim1/TransMIL.py:13-21``
math): BOTH operands are activations, so scales cannot be calibrated
ahead of time.  Here both sides quantize at RUNTIME — per-row for the
left operand, per-column for the right — so the s8×s8→s32 MXU path
(measured 2.04× the bf16 rate on v5e, scripts/probe_int8_conv.py) serves
those GEMMs too, and the rank-1 scale correction folds back in one
multiply:

    y ≈ (round(a/s_r) · round(b/s_c)) · s_r s_c,
    s_r = max|a| over K per row / 127,  s_c = max|b| over K per col / 127.

Per-row/col (not per-tensor) keeps the quantization error relative to
each row/column's own range — softmax rows live in [0,1] while pinv
outputs span ±10s, and one shared scale would crush the former.

Serving-only and opt-in: ``attn_dot(a, b)`` is a plain ``a @ b`` unless
the trace runs inside ``with dynamic_int8_attention():`` (the rounding
has zero gradient, so the training path must never route through it).
The flag is read at TRACE time — enter the context around the first
(tracing) call of a fresh ``jax.jit``; compiled executables keep
whatever mode they were traced with.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

# "" = off (exact matmuls), "value" = only post-softmax value-side
# products (operands bounded by softmax rows — gentlest error), "all" =
# scores too (pre-softmax q·k logits; softmax amplifies their error)
_MODE = contextvars.ContextVar("dynamic_int8_attention", default="")


def dynamic_int8_enabled() -> bool:
    return bool(_MODE.get())


def dynamic_int8_mode() -> str:
    return _MODE.get()


@contextlib.contextmanager
def dynamic_int8_attention(enable: bool = True, scores: bool = True,
                           reassociate_only: bool = False):
    """``reassociate_only``: keep every matmul exact but still take the
    reassociated Nyström chain (ops/nystrom.py) — the 3× N-major-flop
    reduction without any quantization (measured A/B lever; the dynamic
    quantize passes themselves can cost more than the int8 MXU saves)."""
    if not enable:
        mode = ""
    elif reassociate_only:
        mode = "assoc"
    else:
        mode = "all" if scores else "value"
    token = _MODE.set(mode)
    try:
        yield
    finally:
        _MODE.reset(token)


def _quant_rows(a):
    """(..., M, K) → int8 with per-row scale (..., M, 1)."""
    s = jnp.max(jnp.abs(a), axis=-1, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(s, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(a.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _quant_cols(b):
    """(..., K, N) → int8 with per-column scale (..., 1, N)."""
    s = jnp.max(jnp.abs(b), axis=-2, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(s, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(b.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def int8_matmul(a, b):
    """Batched ``a @ b`` on the int8 MXU path with dynamic row/col scales.

    a: (..., M, K), b: (..., K, N) — leading dims broadcast like
    ``jnp.matmul``.
    """
    aq, sa = _quant_rows(a)
    bq, sb = _quant_cols(b)
    y = jnp.matmul(aq, bq, preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * sa * sb
    return out.astype(jnp.result_type(a.dtype, b.dtype))


def attn_dot(a, b, kind: str = "value"):
    """``a @ b`` — int8-dynamic when inside ``dynamic_int8_attention()``
    at trace time, exact native matmul otherwise (the default: bit-
    identical to ``a @ b``).

    ``kind='score'`` marks pre-softmax q·k products: they only quantize
    under ``dynamic_int8_attention(scores=True)`` ('all' mode), since
    softmax amplifies logit rounding; 'value' products (post-softmax ×
    values / pinv outputs) quantize in either mode.
    """
    mode = _MODE.get()
    if mode == "all" or (mode == "value" and kind == "value"):
        return int8_matmul(a, b)
    return a @ b
