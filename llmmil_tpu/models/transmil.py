"""TransMIL: Nyström-attention MIL over long instance bags.

Parity targets: ``model/dim1/TransMIL.py`` (TransLayer/PPEG/TransMIL) and the
external ``nystrom_attention`` package it imports (``TransMIL.py:13-21``),
reimplemented here TPU-native: the Nyström core is a pure-JAX O(N·m) attention
(``llmmil_tpu.ops.nystrom``) whose matmuls are MXU-shaped, and PPEG's
depthwise convs run NHWC.  Everything is batched and mask-aware; ``mask=None``
matches the reference's unmasked numerics.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..ops.nystrom import nystrom_attention

if TYPE_CHECKING:                                   # pragma: no cover
    from .moe import MoESpec


class NystromSelfAttention(nn.Module):
    """Self-attention with Nyström approximation + residual value conv.

    Matches lucidrains' ``NystromAttention`` module semantics: qkv projection
    without bias, front-padding to a multiple of ``num_landmarks`` (padded
    rows participate when ``mask=None``, exactly like the reference), scaled
    q, landmark segment-means, 3-softmax Nyström product with iterative
    Moore–Penrose pinv, depthwise residual conv over values, output proj.
    """
    dim: int = 512
    heads: int = 8
    dim_head: int = 64
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 return_attn: bool = False):
        b, n, _ = x.shape
        h, dh, m = self.heads, self.dim_head, self.num_landmarks
        inner = h * dh

        # Front-pad so the token count divides the landmark count.
        rem = n % m
        pad = (m - rem) % m
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (pad, 0)),
                               constant_values=False)

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):  # (B, N, inner) -> (B, H, N, Dh)
            return jnp.swapaxes(t.reshape(b, -1, h, dh), 1, 2)

        q, k, v = map(heads_split, (q, k, v))
        if mask is not None:
            # zero out invalid value/key rows like the torch implementation
            mv = mask[:, None, :, None]
            q, k, v = (jnp.where(mv, t, 0.0) for t in (q, k, v))

        out, attn = nystrom_attention(
            q, k, v, num_landmarks=m,
            pinv_iterations=self.pinv_iterations, mask=mask,
            return_attn=return_attn)

        out = jnp.swapaxes(out, 1, 2).reshape(b, -1, inner)
        if self.residual:
            # Depthwise conv over the token axis, per head (kernel (33, 1);
            # same param as lax.conv NCHW/OIHW groups=h).  Computed as 33
            # shifted multiply-adds on the (N, H·Dh) layout: the direct
            # depthwise conv has C = heads = 8 channels — XLA's
            # low-channel conv emitters ran its BACKWARD at ~0.03% MFU
            # (~19 of the 23.8 ms/layer Nyström grad, profiled r3); the
            # shift-and-add form is lane-perfect VPU work with trivial
            # transposed gradients.
            kk = self.residual_conv_kernel
            ker = self.param(
                "res_conv",
                nn.initializers.lecun_normal(),
                (h, 1, kk, 1), self.dtype)
            vflat = jnp.swapaxes(v, 1, 2).reshape(
                b, -1, inner).astype(self.dtype)
            vp = jnp.pad(vflat, ((0, 0), (kk // 2, kk // 2), (0, 0)))
            kex = jnp.repeat(jnp.transpose(ker[:, 0, :, 0]), dh,
                             axis=-1)                     # (kk, H·Dh)
            np_ = vflat.shape[1]
            res = kex[0] * vp[:, 0:np_]
            for t in range(1, kk):
                res = res + kex[t] * vp[:, t:t + np_]
            out = out + res
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = out[:, -n:]                       # drop the front padding
        if return_attn and attn is not None:
            # factored (left, right) map — slice the front padding off both
            # sides; consumers reconstruct rows via ops.nystrom helpers
            left, right = attn
            attn = (left[:, :, -n:, :], right[:, :, :, -n:])
        return out, attn


class TransLayer(nn.Module):
    """Pre-norm Nyström block with residual (TransMIL.py:8-28).

    ``moe``: optional routed-FFN residual block after the attention
    (models/moe.py — beyond reference, the reference block is
    attention-only; None keeps the reference param tree and numerics).
    """
    dim: int = 512
    dtype: jnp.dtype = jnp.float32
    moe: "Optional[MoESpec]" = None
    # reference default 6 (TransMIL.py:19); a debug/dryrun knob like
    # Config.ct_layers — fewer unrolled pinv iterations shrink the
    # compiled graph, parity requires 6
    pinv_iterations: int = 6

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 return_attn: bool = False):
        y, attn = NystromSelfAttention(
            dim=self.dim, heads=8, dim_head=self.dim // 8,
            num_landmarks=self.dim // 2,
            pinv_iterations=self.pinv_iterations,
            residual=True, dropout=0.1, dtype=self.dtype,
            name="attn")(nn.LayerNorm(name="norm")(x), mask, train,
                         return_attn)
        x = x + y
        if self.moe is not None:
            from .moe import MoEFFN
            m = self.moe
            x = x + MoEFFN(dim=self.dim, hidden=m.hidden,
                           n_experts=m.experts, k=m.k,
                           capacity_factor=m.capacity_factor,
                           group_size=m.group_size, dtype=self.dtype,
                           name="moe")(nn.LayerNorm(name="moe_norm")(x),
                                       mask=mask, train=train)
        return x, attn


class PPEG(nn.Module):
    """Pyramid positional-encoding generator (TransMIL.py:31-45): three
    depthwise 2-D convs (7/5/3) on the √N×√N token grid + identity, with the
    cls token passed through untouched."""
    dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int, mask=None):
        b, _, c = x.shape
        cls_tok, feat = x[:, :1], x[:, 1:]
        if mask is not None:
            # keep masked tokens out of the conv taps (they'd bleed garbage
            # into valid neighbours on the grid)
            feat = jnp.where(mask[:, 1:, None], feat, 0.0)
        grid = feat.reshape(b, H, W, c)          # NHWC
        out = grid
        for ksize, name in ((7, "proj"), (5, "proj1"), (3, "proj2")):
            out = out + nn.Conv(
                self.dim, (ksize, ksize), padding="SAME",
                feature_group_count=self.dim, dtype=self.dtype,
                name=name)(grid)
        return jnp.concatenate([cls_tok, out.reshape(b, H * W, c)], axis=1)


class TransMIL(nn.Module):
    """fc1 → square wrap-pad → cls token → TransLayer → PPEG → TransLayer →
    LayerNorm → cls embedding (TransMIL.py:48-107).

    Returns (cls_embedding (B, D), [attn0, attn1]).  ``n_classes`` is kept
    for the reference's (unused-in-forward) ``_fc2`` head symmetry.
    """
    n_classes: int = 2
    L: int = 768
    D: int = 512
    dtype: jnp.dtype = jnp.float32
    moe: "Optional[MoESpec]" = None
    pinv_iterations: int = 6       # see TransLayer (dryrun knob)

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 return_attn: bool = False):
        h = nn.relu(nn.Dense(self.D, dtype=self.dtype, name="fc1")(x))

        n = h.shape[1]
        side = int(math.ceil(math.sqrt(n)))
        add = side * side - n
        if add:
            h = jnp.concatenate([h, h[:, :add]], axis=1)   # wrap-around pad
            if mask is not None:
                mask = jnp.concatenate([mask, mask[:, :add]], axis=1)

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.D), self.dtype)
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (h.shape[0], 1, self.D)), h], axis=1)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)

        h, attn0 = TransLayer(self.D, self.dtype, moe=self.moe,
                              pinv_iterations=self.pinv_iterations,
                              name="layer1")(h, mask, train, return_attn)
        h = PPEG(self.D, self.dtype, name="pos_layer")(h, side, side, mask)
        h, attn1 = TransLayer(self.D, self.dtype, moe=self.moe,
                              pinv_iterations=self.pinv_iterations,
                              name="layer2")(h, mask, train, return_attn)

        h = nn.LayerNorm(name="norm")(h)[:, 0]
        return h, [attn0, attn1]
