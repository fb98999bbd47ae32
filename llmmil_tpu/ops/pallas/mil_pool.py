"""Fused masked gated-attention MIL pooling — Pallas TPU kernel.

The hot op of the framework (SURVEY §2.9/§5): pools a 768-d instance bag of
up to ~16k rows into one feature vector via Ilse-style gated attention

    a_i = w·(tanh(x_i V) ⊙ σ(x_i U)) + b        (per-instance logit)
    p   = masked_softmax(a)                      (over instances)
    M   = Σ_i p_i x_i

Unfused, XLA materialises the (N, D) gate activations and (N,) logits in HBM
between kernels; this kernel streams each bag tile HBM→VMEM once per pass
(double-buffered DMA), keeps the logits vector entirely in VMEM (≤64 KB), and
does both gate matmuls and the weighted-sum matmul on the MXU:

  pass 1: tile → [tanh(xV) ⊙ σ(xU)] w → logits scratch (VMEM)
  softmax: masked, numerically stable, in VMEM
  pass 2: tile → p_tile @ x_tile accumulated into the pooled output

Backward is a custom VJP in plain JAX (recompute-from-residuals): the
analytic gradients contract back onto the same matmul shapes and XLA fuses
them well; the forward is the latency-critical path (eval is batch-1 per
patient in the reference, test_ddp.py:73).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..masked import masked_softmax

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mil_kernel(x_ref, mask_ref, wv_ref, bv_ref, wu_ref, bu_ref, ww_ref,
                bw_ref, out_ref, attn_ref, logits_vmem, xtile_vmem, sem,
                *, block_n: int, n_total: int):
    """One grid program = one bag.  x_ref is the full (B, N, L) array in
    HBM (ANY space); the program's bag is selected by program_id and tiles
    are DMA'd into VMEM scratch with double buffering."""
    n_tiles = n_total // block_n
    bag = pl.program_id(0)

    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            x_ref.at[bag, pl.ds(tile * block_n, block_n), :],
            xtile_vmem.at[slot], sem.at[slot])

    # ---- single pass: online (flash-style) masked softmax-pool -----------
    # Each bag tile is read from HBM exactly ONCE: per tile we compute the
    # gate logits, fold them into a running (max, denominator, weighted-sum)
    # triple with exp-rescaling, and stash the raw logits as a (1, N) VMEM
    # row (a (N, 1) column would pad every row to a 128-lane tile — 8 MB for
    # 16k instances).  Half the HBM traffic of the unfused two-pass XLA
    # schedule, which is HBM-bound.
    get_dma(0, 0).start()
    l_dim = out_ref.shape[-1]

    def body(tile, carry):
        m_run, s_run, acc = carry
        slot = tile % 2

        @pl.when(tile + 1 < n_tiles)
        def _():
            get_dma((tile + 1) % 2, tile + 1).start()

        get_dma(slot, tile).wait()
        # Matmuls run in the bag's native dtype (bf16 in production) with
        # fp32 accumulation: bf16×bf16 products are exact in fp32, and the
        # v5e MXU runs bf16 at full rate — the fp32-upcast variant of this
        # kernel was MXU-rate-bound at ~3× the bf16 GEMM roofline (BENCH
        # notes r2).  fp32 bags keep fully-fp32 numerics (parity tests).
        x = xtile_vmem[slot]
        cd = x.dtype
        gv = jnp.tanh(jnp.dot(x, wv_ref[:].astype(cd),
                              preferred_element_type=jnp.float32)
                      + bv_ref[:])
        gu = jax.nn.sigmoid(jnp.dot(x, wu_ref[:].astype(cd),
                                    preferred_element_type=jnp.float32)
                            + bu_ref[:])
        # (1, D) · (T, D)ᵀ → (1, T): logits as a row, no transpose store
        logits = jax.lax.dot_general(
            jnp.swapaxes(ww_ref[:], 0, 1), gv * gu,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bw_ref[0, 0]
        mt = mask_ref[0, :, pl.ds(tile * block_n, block_n)]   # (1, T)
        lg = jnp.where(mt > 0, logits, NEG_INF)
        logits_vmem[:, pl.ds(tile * block_n, block_n)] = lg

        m_new = jnp.maximum(m_run, jnp.max(lg))
        e = jnp.where(mt > 0, jnp.exp(lg - m_new), 0.0)       # (1, T)
        scale = jnp.exp(m_run - m_new)
        acc = acc * scale + jnp.dot(e.astype(cd), x,
                                    preferred_element_type=jnp.float32)
        s_new = s_run * scale + jnp.sum(e)
        return m_new, s_new, acc

    m_fin, s_fin, acc = jax.lax.fori_loop(
        0, n_tiles, body,
        (jnp.float32(NEG_INF), jnp.float32(0.0),
         jnp.zeros((1, l_dim), jnp.float32)), unroll=False)

    denom = jnp.maximum(s_fin, 1e-30)
    out_ref[0, :, :] = (acc / denom).astype(out_ref.dtype)
    lg_all = logits_vmem[:, :]                                 # (1, N)
    m_all = mask_ref[0, :, :]
    p = jnp.where(m_all > 0, jnp.exp(lg_all - m_fin) / denom, 0.0)
    attn_ref[0, :, :] = p.astype(attn_ref.dtype)


def _mil_pool_fwd_pallas(x, mask, wv, bv, wu, bu, ww, bw,
                         block_n: int = 512, interpret: bool = False):
    b, n, l = x.shape
    d = wv.shape[1]
    n_pad = _round_up(max(n, block_n), block_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, n_pad - n)))
    mask_i = mask.astype(jnp.int32)[:, None, :]            # (B, 1, N)

    kernel = functools.partial(_mil_kernel, block_n=block_n, n_total=n_pad)
    out, attn = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x stays in HBM
            pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # mask per bag
            pl.BlockSpec((l, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, l), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), jnp.float32),            # logits row
            pltpu.VMEM((2, block_n, l), x.dtype),           # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * l * (2 * d + 1) + 2 * b * n_pad * l,
            bytes_accessed=2 * b * n_pad * l * x.dtype.itemsize,
            transcendentals=2 * b * n_pad * d,
        ),
    )(x, mask_i, wv, bv.reshape(1, d), wu, bu.reshape(1, d), ww,
      bw.reshape(1, 1))
    return out[:, 0], attn[:, 0, :n]


def mil_pool_reference(x, mask, wv, bv, wu, bu, ww, bw):
    """Plain-JAX reference (identical math; used for VJP recompute and as
    the CPU fallback)."""
    xm = jnp.where(mask[..., None], x, 0.0).astype(jnp.float32)
    a = (jnp.tanh(xm @ wv + bv) * jax.nn.sigmoid(xm @ wu + bu)) @ ww + bw
    p = masked_softmax(a[..., 0], mask, axis=-1)            # (B, N)
    pooled = jnp.einsum("bn,bnl->bl", p, xm)
    return pooled, p


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def mil_pool(x, mask, wv, bv, wu, bu, ww, bw, block_n: int = 512,
             interpret: bool = False):
    """Fused masked gated-attention pooling.

    x: (B, N, L); mask: (B, N) bool; returns (pooled (B, L), attn (B, N)).
    """
    return _mil_pool_fwd_pallas(x, mask, wv, bv, wu, bu, ww, bw,
                                block_n, interpret)


def _fwd(x, mask, wv, bv, wu, bu, ww, bw, block_n, interpret):
    out = _mil_pool_fwd_pallas(x, mask, wv, bv, wu, bu, ww, bw,
                               block_n, interpret)
    return out, (x, mask, wv, bv, wu, bu, ww, bw)


def _bwd(block_n, interpret, res, grads):
    x, mask, wv, bv, wu, bu, ww, bw = res
    g_pooled, g_attn = grads

    def fwd_fn(x, wv, bv, wu, bu, ww, bw):
        return mil_pool_reference(x, mask, wv, bv, wu, bu, ww, bw)

    _, vjp = jax.vjp(fwd_fn, x, wv, bv, wu, bu, ww, bw)
    gx, gwv, gbv, gwu, gbu, gww, gbw = vjp((g_pooled, g_attn))
    return gx, None, gwv, gbv, gwu, gbu, gww, gbw


mil_pool.defvjp(_fwd, _bwd)
