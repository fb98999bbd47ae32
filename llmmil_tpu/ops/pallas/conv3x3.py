"""Fused 3×3 stride-1 SAME conv (NHWC) as Pallas MXU kernels — fwd, input
gradient, and weight gradient.

Target: MC3 layer1's four depth-folded convolutions
(``models/ct_mc3.py::DepthFoldedConv``, reference
``model/dim3/resnetMC3.py:6-32`` trunk) — (B·D, 128, 128, 192) → 64 at
production size.  XLA's TPU conv emitters run these cout-64 stages at
~21% MFU fwd / ~22% grad (BENCH_NOTES r2 stage profile) and the measured
in-XLA lowerings (dfold/dsum/dshift/im2col) are exhausted; this kernel
reformulates the conv as explicit MXU GEMMs:

- forward / input-grad: for each row-block, the 9 taps are row/col-shifted
  VMEM slices of the padded image GEMM'd against the (C, F) tap kernels
  with fp32 accumulation — K = C per tap, no im2col HBM blowup (the padded
  image is fetched to VMEM once and stays resident across its row-blocks);
- input-grad IS the forward kernel on the 180°-rotated, transposed kernel
  (correlation transpose identity), so one kernel serves both;
- weight-grad: dW[tap] = Σ_pixels x_tap^T · dy — a grid-accumulated
  dot_general per row-block into a VMEM-resident (9·C, F) fp32 block.

The kernels are exact vs ``lax.conv_general_dilated`` (same mixed
precision: native-dtype products, fp32 accumulation) —
tests/test_conv3x3.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bh(h: int, target: int = 16) -> int:
    for bh in range(min(target, h), 0, -1):
        if h % bh == 0:
            return bh
    return h


def _supported(x, w):
    n, h, wd, c = x.shape
    kh, kw, wc, f = w.shape
    return (kh, kw) == (3, 3) and wc == c


def _fwd_kernel(x_ref, w_ref, y_ref, acc_ref, *, bh, width, cin):
    """One (image, row-block) grid step: 9 tap-GEMMs, fp32 accumulation.

    x_ref: (1, H+2, W+2, C) — whole padded image, resident across the
    row-blocks of this image (its block index ignores the row grid dim).
    w_ref: (9·C, F) tap-stacked kernel.  y_ref: (1, bh, W, F).
    """
    r = pl.program_id(1)
    base = r * bh
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dr in range(3):
        for dc in range(3):
            xs = x_ref[0, pl.ds(base + dr, bh), pl.ds(dc, width), :]
            xm = xs.reshape(bh * width, cin)
            wt = w_ref[pl.ds((dr * 3 + dc) * cin, cin), :]
            acc_ref[:] += jnp.dot(xm, wt,
                                  preferred_element_type=jnp.float32)
    y_ref[0] = acc_ref[:].reshape(bh, width, y_ref.shape[-1]).astype(
        y_ref.dtype)


def _fwd_patch_kernel(x_ref, w_ref, y_ref, patch_ref, *, bh, width, cin):
    """Patch-matrix variant: materialise the (bh·W, 9·C) im2col block in
    VMEM (9 shifted copies), then ONE long-K GEMM — deeper MXU contraction
    (K = 9·C) at the cost of the extra VMEM traffic."""
    r = pl.program_id(1)
    base = r * bh
    for dr in range(3):
        for dc in range(3):
            xs = x_ref[0, pl.ds(base + dr, bh), pl.ds(dc, width), :]
            t = dr * 3 + dc
            patch_ref[:, pl.ds(t * cin, cin)] = xs.reshape(bh * width, cin)
    y = jnp.dot(patch_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[0] = y.reshape(bh, width, y_ref.shape[-1]).astype(y_ref.dtype)


def _tout_kernel(x_ref, w_ref, yt_ref, patch_ref, *, bh, width, cin):
    """Transposed-output variant: y^T(F, bh·W) = w^T(F, 9C) · patch^T.

    With cout = 64, the natural (pixels, F) GEMM fills only half the MXU's
    128 output lanes (the measured XLA-fwd ceiling, ~27% MFU); putting the
    PIXEL axis on the lanes makes every output tile full.  No input
    relayout needed: dot_general contracts w's dim 0 against patch's
    dim 1 directly, and the (F, N·H·W) result is transposed back to NHWC
    by one cheap XLA pass outside the kernel.
    """
    r = pl.program_id(1)
    base = r * bh
    for dr in range(3):
        for dc in range(3):
            xs = x_ref[0, pl.ds(base + dr, bh), pl.ds(dc, width), :]
            t = dr * 3 + dc
            patch_ref[:, pl.ds(t * cin, cin)] = xs.reshape(bh * width, cin)
    yt = jax.lax.dot_general(
        w_ref[:], patch_ref[:], (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (F, bh·W)
    yt_ref[:] = yt.astype(yt_ref.dtype)


def _conv_fwd(x, w, *, block_h=16, interpret=False, mode="taps"):
    """x: (N, H, W, C), w: (3, 3, C, F) → (N, H, W, F)."""
    n, h, wd, c = x.shape
    f = w.shape[-1]
    bh = _pick_bh(h, block_h)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * c, f).astype(x.dtype)
    flops = 2 * n * h * wd * 9 * c * f
    if mode == "tout":
        nblk = h // bh
        yt = pl.pallas_call(
            functools.partial(_tout_kernel, bh=bh, width=wd, cin=c),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2 ** 20),
            grid=(n, nblk),
            in_specs=[
                pl.BlockSpec((1, h + 2, wd + 2, c),
                             lambda i, r: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * c, f), lambda i, r: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((f, bh * wd),
                                   lambda i, r, nblk=nblk: (0, i * nblk + r),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((f, n * h * wd), x.dtype),
            scratch_shapes=[pltpu.VMEM((bh * wd, 9 * c), x.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=xp.nbytes + n * h * wd * f * 2,
                transcendentals=0),
            interpret=interpret,
        )(xp, wf)
        return jnp.transpose(yt.reshape(f, n, h, wd), (1, 2, 3, 0))
    if mode == "patch":
        kern = functools.partial(_fwd_patch_kernel, bh=bh, width=wd, cin=c)
        scratch = [pltpu.VMEM((bh * wd, 9 * c), x.dtype)]
    else:
        kern = functools.partial(_fwd_kernel, bh=bh, width=wd, cin=c)
        scratch = [pltpu.VMEM((bh * wd, f), jnp.float32)]
    return pl.pallas_call(
        kern,
        compiler_params=pltpu.CompilerParams(
            # the resident padded image + double-buffered out blocks exceed
            # the 16 MiB default scoped-vmem limit at the layer1 shape
            # (measured 18.27 MiB); v5e VMEM is 128 MiB physical
            vmem_limit_bytes=64 * 2 ** 20),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, c), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, f), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wd, f), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, f), x.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xp.nbytes + n * h * wd * f * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, wf)


def _wgrad_kernel(x_ref, dy_ref, dw_ref, *, bh, width, cin):
    """Grid-accumulated dW^(9·C, F): dw += x_tap^T @ dy per row-block."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    r = pl.program_id(1)
    base = r * bh
    dy = dy_ref[0].reshape(bh * width, dy_ref.shape[-1])
    for dr in range(3):
        for dc in range(3):
            xs = x_ref[0, pl.ds(base + dr, bh), pl.ds(dc, width), :]
            xm = xs.reshape(bh * width, cin)
            contrib = jax.lax.dot_general(
                xm, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (C, F)
            dw_ref[pl.ds((dr * 3 + dc) * cin, cin), :] += contrib


def _wgrad_tout_kernel(x_ref, dy_ref, dwt_ref, patch_ref, *,
                       bh, width, cin):
    """Transposed wgrad: dw^T(F, 9C) += dy^T · patch, full output lanes
    (9C = 1728 on the lanes vs 64 in the natural orientation); both
    contractions are over the leading pixel axis — no input relayouts."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)

    r = pl.program_id(1)
    base = r * bh
    for dr in range(3):
        for dc in range(3):
            xs = x_ref[0, pl.ds(base + dr, bh), pl.ds(dc, width), :]
            t = dr * 3 + dc
            patch_ref[:, pl.ds(t * cin, cin)] = xs.reshape(bh * width, cin)
    dy = dy_ref[0].reshape(bh * width, dy_ref.shape[-1])
    contrib = jax.lax.dot_general(
        dy, patch_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (F, 9C)
    dwt_ref[:] += contrib


def _conv_wgrad(x, dy, *, block_h=16, interpret=False, mode="taps"):
    """x: (N, H, W, C), dy: (N, H, W, F) → dw (3, 3, C, F) fp32."""
    n, h, wd, c = x.shape
    f = dy.shape[-1]
    bh = _pick_bh(h, block_h)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flops = 2 * n * h * wd * 9 * c * f
    if mode == "tout":
        dwt = pl.pallas_call(
            functools.partial(_wgrad_tout_kernel, bh=bh, width=wd, cin=c),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2 ** 20),
            grid=(n, h // bh),
            in_specs=[
                pl.BlockSpec((1, h + 2, wd + 2, c),
                             lambda i, r: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bh, wd, f), lambda i, r: (i, r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((f, 9 * c), lambda i, r: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((f, 9 * c), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bh * wd, 9 * c), x.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xp.nbytes + dy.nbytes + 9 * c * f * 4,
                transcendentals=0),
            interpret=interpret,
        )(xp, dy)
        return jnp.transpose(dwt).reshape(3, 3, c, f)
    dw = pl.pallas_call(
        functools.partial(_wgrad_kernel, bh=bh, width=wd, cin=c),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, c), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, wd, f), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c, f), lambda i, r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xp.nbytes + dy.nbytes + 9 * c * f * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, dy)
    return dw.reshape(3, 3, c, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3(x, w, block_h: int = 16, interpret: bool = False):
    """3×3 stride-1 SAME NHWC conv on the MXU with a custom backward.

    Exact (same fp32-accumulated mixed precision) replacement for
    ``lax.conv_general_dilated(x, w, (1, 1), 'SAME', NHWC/HWIO)``; use for
    cout-narrow convs where XLA's emitters underperform (MC3 layer1).
    """
    if not _supported(x, w):
        raise ValueError(f"conv3x3 needs 3×3 kernels, got {w.shape}")
    return _conv_fwd(x, w, block_h=block_h, interpret=interpret)


def _conv3x3_fwd(x, w, block_h, interpret):
    return _conv_fwd(x, w, block_h=block_h, interpret=interpret), (x, w)


def _conv3x3_bwd(block_h, interpret, res, g):
    x, w = res
    # input grad = forward kernel on the rotated, in/out-swapped kernel
    w_rot = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv_fwd(g.astype(x.dtype), w_rot, block_h=block_h,
                   interpret=interpret)
    dw = _conv_wgrad(x, g.astype(x.dtype), block_h=block_h,
                     interpret=interpret)
    return dx, dw.astype(w.dtype)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_reference(x, w):
    """The XLA path this kernel replaces (for parity tests/benches) —
    exactly DepthFoldedConv's conv2d call (native dtype; the TPU MXU
    accumulates fp32 internally either way)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3x3_vmem_bytes(x_shape, f, block_h=16) -> int:
    """Rough per-kernel VMEM requirement (for gating on real shapes)."""
    n, h, wd, c = x_shape
    bh = _pick_bh(h, block_h)
    itemsize = 2
    return ((h + 2) * (wd + 2) * c * itemsize * 2     # resident padded image
            + 9 * c * f * itemsize                    # kernel
            + bh * wd * f * (4 + 2 * itemsize)        # acc + out double-buf
            + bh * wd * c * itemsize)                 # tap slice scratch
