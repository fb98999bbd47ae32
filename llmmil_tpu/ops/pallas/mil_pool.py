"""Fused masked gated-attention MIL pooling — Pallas TPU kernel.

The hot op of the framework (SURVEY §2.9/§5): pools a 768-d instance bag of
up to ~16k rows into one feature vector via Ilse-style gated attention

    a_i = w·(tanh(x_i V) ⊙ σ(x_i U)) + b        (per-instance logit)
    p   = masked_softmax(a)                      (over instances)
    M   = Σ_i p_i x_i

Design (v3, single pass, flash-style):
- each bag tile is DMA'd HBM→VMEM exactly once (double buffered);
- the gate projections x@V / x@U are real (T, D) GEMMs on the MXU;
- the two rank-1 contractions that would underutilise the MXU (logit
  reduction over D and the Σ p_i x_i pooling over T) run on the VPU as
  broadcast-multiply + axis reductions;
- masking enters as an additive −∞ bias column DMA'd per tile;
- the running (max, denominator, weighted-sum) triple is rescaled online, so
  HBM traffic is ~half of XLA's unfused schedule;
- raw logits stream back to an HBM output per tile; the attention
  probabilities are one cheap XLA softmax outside the kernel.

Backward is a custom VJP in plain JAX (recompute-from-residuals): the
analytic gradients contract back onto well-shaped matmuls which XLA fuses;
the forward is the latency-critical path (eval is batch-1 per patient in the
reference, test_ddp.py:73).
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


def _mil_kernel(x_ref, bias_ref, wv_ref, bv_ref, wu_ref, bu_ref, ww_ref,
                bw_ref, out_ref, logits_out_ref, xtile_vmem, bias_vmem,
                lg_vmem, sem_x, sem_b, sem_o,
                *, block_n: int, n_total: int):
    """One grid program = one bag.  x_ref (B, N, L) and bias_ref (B, N, 1)
    live in HBM (ANY); logits_out_ref (B, N, 1) is an HBM output."""
    n_tiles = n_total // block_n
    bag = pl.program_id(0)

    def x_dma(slot, tile):
        return pltpu.make_async_copy(
            x_ref.at[bag, pl.ds(tile * block_n, block_n), :],
            xtile_vmem.at[slot], sem_x.at[slot])

    def b_dma(slot, tile):
        return pltpu.make_async_copy(
            bias_ref.at[bag, pl.ds(tile * block_n, block_n), :],
            bias_vmem.at[slot], sem_b.at[slot])

    def o_dma(slot, tile):
        return pltpu.make_async_copy(
            lg_vmem.at[slot],
            logits_out_ref.at[bag, pl.ds(tile * block_n, block_n), :],
            sem_o.at[slot])

    x_dma(0, 0).start()
    b_dma(0, 0).start()
    l_dim = out_ref.shape[-1]
    w_dt = xtile_vmem.dtype
    ww_row = jnp.swapaxes(ww_ref[:], 0, 1)            # (1, D), tiny

    def body(tile, carry):
        m_run, s_run, acc = carry
        slot = tile % 2

        @pl.when(tile + 1 < n_tiles)
        def _():
            x_dma((tile + 1) % 2, tile + 1).start()
            b_dma((tile + 1) % 2, tile + 1).start()

        x_dma(slot, tile).wait()
        b_dma(slot, tile).wait()
        x = xtile_vmem[slot]                          # (T, L) input dtype
        # gate GEMMs on the MXU (weights cast to the input dtype)
        gv = jnp.tanh(jnp.dot(x, wv_ref[:].astype(w_dt),
                              preferred_element_type=jnp.float32)
                      + bv_ref[:])
        gu = jax.nn.sigmoid(jnp.dot(x, wu_ref[:].astype(w_dt),
                                    preferred_element_type=jnp.float32)
                            + bu_ref[:])
        # rank-1 logit reduction on the VPU: (T, D)·(1, D) → sum lanes
        lg = jnp.sum(gv * gu * ww_row, axis=1, keepdims=True) \
            + bw_ref[0, 0] + bias_vmem[slot]          # (T, 1)

        # stream raw logits to HBM (wait for the previous tile's copy
        # before reusing the slot)
        @pl.when(tile >= 2)
        def _():
            o_dma(slot, tile - 2).wait()
        lg_vmem[slot] = lg
        o_dma(slot, tile).start()

        m_new = jnp.maximum(m_run, jnp.max(lg))
        e = jnp.exp(lg - m_new)                       # (T, 1); −∞ bias → 0
        scale = jnp.exp(m_run - m_new)
        # Σ e_i x_i on the VPU: broadcast over lanes, reduce sublanes
        contrib = jnp.sum(e * x.astype(jnp.float32), axis=0, keepdims=True)
        acc = acc * scale + contrib
        s_new = s_run * scale + jnp.sum(e)
        return m_new, s_new, acc

    m_fin, s_fin, acc = jax.lax.fori_loop(
        0, n_tiles, body,
        (jnp.float32(NEG_INF), jnp.float32(0.0),
         jnp.zeros((1, l_dim), jnp.float32)), unroll=False)

    out_ref[0, :, :] = (acc / jnp.maximum(s_fin, 1e-30)).astype(
        out_ref.dtype)
    # drain the last two logits copies
    @pl.when(n_tiles >= 2)
    def _():
        o_dma((n_tiles - 2) % 2, n_tiles - 2).wait()
    o_dma((n_tiles - 1) % 2, n_tiles - 1).wait()


def _mil_pool_fwd_pallas(x, mask, wv, bv, wu, bu, ww, bw,
                         block_n: int = 512, interpret: bool = False):
    b, n, l = x.shape
    d = wv.shape[1]
    n_pad = _round_up(max(n, block_n), block_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, n_pad - n)))
    bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[..., None]

    kernel = functools.partial(_mil_kernel, block_n=block_n, n_total=n_pad)
    out, logits = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x in HBM
            pl.BlockSpec(memory_space=pl.ANY),          # bias in HBM
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
            pl.BlockSpec(memory_space=pl.ANY),          # logits in HBM
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, l), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_n, l), x.dtype),       # x double buffer
            pltpu.VMEM((2, block_n, 1), jnp.float32),   # bias double buffer
            pltpu.VMEM((2, block_n, 1), jnp.float32),   # logits out buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * l * 2 * d + 4 * b * n_pad * (l + d),
            bytes_accessed=b * n_pad * l * x.dtype.itemsize,
            transcendentals=3 * b * n_pad * d,
        ),
    )(x, bias, wv, bv.reshape(1, d), wu, bu.reshape(1, d), ww,
      bw.reshape(1, 1))
    # attention probabilities: one cheap XLA softmax over the raw logits
    attn = masked_softmax(logits[:, :n, 0], mask[:, :n], axis=-1)
    return out[:, 0], attn


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
