"""Chunked slice-transformer CT encoder.

Parity target: ``model/dim3/mvit_v2.py:9-27`` — the volume is split into
3-slice chunks, each chunk encoded to a 512-d token by a video transformer
(torchvision ``mvit_v2_s`` in the reference; absent external weights), and
the chunk-token sequence aggregated with TransMIL.

TPU-native design: chunks are a static reshape (D is fixed at 160), the
per-chunk encoder is a compact ViT over 16×16 patches vmapped across chunks —
one big batched MXU workload instead of the reference's per-chunk python loop
(mvit_v2.py:24-26).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .transmil import TransMIL


class _ChunkViT(nn.Module):
    """3-slice chunk (H, W, 3) → 512-d embedding."""
    width: int = 192
    depth: int = 4
    heads: int = 6
    patch: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3)
        x = nn.Conv(self.width, (self.patch, self.patch),
                    (self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        pos = self.param("pos", nn.initializers.normal(0.02), (h * w, c))
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"ln1_{i}")(x)
            x = x + nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype,
                name=f"attn_{i}")(y, y)
            y = nn.LayerNorm(name=f"ln2_{i}")(x)
            y = nn.gelu(nn.Dense(4 * self.width, dtype=self.dtype,
                                 name=f"mlp1_{i}")(y))
            x = x + nn.Dense(self.width, dtype=self.dtype,
                             name=f"mlp2_{i}")(y)
        x = nn.LayerNorm(name="ln_out")(x).mean(axis=1)
        return nn.Dense(512, dtype=self.dtype, name="head")(x)


class MViTChunked(nn.Module):
    """(B, D, H, W, 1) volume → TransMIL over ⌈D/3⌉ chunk tokens.
    Returns (cls_embedding (B, 512), attn maps) like the reference's
    ``return self.TransMIL(x_features)`` (mvit_v2.py:27).

    ``arch='v2_s'`` uses the MViT-v2 multiscale encoder (the reference's
    mvit_v2_s); ``arch='compact'`` keeps the small plain-ViT chunk encoder.
    ``depths``/``dims``/``heads`` shrink the tower for tests/dry-runs.
    """
    n_classes: int = 2
    arch: str = "v2_s"
    depths: tuple = (1, 2, 11, 2)
    dims: tuple = (96, 192, 384, 768)
    heads: tuple = (1, 2, 4, 8)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        b, d, h, w, _ = x.shape
        n_chunks = -(-d // 3)
        pad = n_chunks * 3 - d
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        # (B, n_chunks, 3, H, W) → (B·n, H, W, 3)
        chunks = x[..., 0].reshape(b, n_chunks, 3, h, w)
        chunks = chunks.transpose(0, 1, 3, 4, 2).reshape(
            b * n_chunks, h, w, 3)
        if self.arch == "v2_s":
            enc = MViTv2Encoder(depths=tuple(self.depths),
                                dims=tuple(self.dims),
                                heads=tuple(self.heads),
                                dtype=self.dtype, name="chunk_mvit")
        else:                                     # round-1 compact ViT
            enc = _ChunkViT(dtype=self.dtype, name="chunk_vit")
        feats = enc(chunks)
        feats = feats.reshape(b, n_chunks, 512)
        return TransMIL(n_classes=self.n_classes, L=512, dtype=self.dtype,
                        name="transmil")(feats, train=train)


# ---------------------------------------------------------------------------
# MViT-v2 (Li et al., CVPR 2022) — the reference's torchvision mvit_v2_s
# chunk encoder (mvit_v2.py:15-17).  The reference feeds each 3-slice chunk
# as a 3-channel image (torchvision video MViT unsqueezes a T=1 temporal
# axis, so every (3,·,·)-kernel temporal tap except the centre sees zero
# padding), hence the encoder here is the exact 2-D-spatial reading of
# torchvision's ``models.video.mvit_v2_s`` (torchvision video/mvit.py):
# conv patchify + class token, 16 MultiscaleBlocks (depths 1/2/11/2, dims
# 96→768, heads 1→8, q-pooling stride 2 + channel expansion at each stage
# transition, kv pooling 8/4/2/1), pooled attention with SHARED-per-head
# depthwise pool convs + per-head LayerNorm, decomposed spatial relative
# position bias on the grid (class row/col excluded), residual pooling
# without the class embedding (residual_with_cls_embed=False), the skip
# path projected from the PRE-norm stream (proj_after_attn=True), class-
# token readout.  ``rel_pos_t`` survives as its single T=1 row (the bias
# skips the class column, so softmax does NOT cancel it).  Weights load
# via ``torch_import.convert_mvit_v2_state_dict``; the head maps 768 →
# 512 like the reference's replaced ``model.head[1]`` (mvit_v2.py:16-17).
# ---------------------------------------------------------------------------

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class MSBlockConfig:
    """One MultiscaleBlock (torchvision's per-block config lists)."""
    in_dim: int
    out_dim: int
    heads: int
    q_stride: int = 1
    kv_stride: int = 1
    pool_kernel: int = 3


def mvit_v2_s_blocks(depths=(1, 2, 11, 2), dims=(96, 192, 384, 768),
                     heads=(1, 2, 4, 8), kv_first: int = 8):
    """torchvision ``mvit_v2_s`` block setting: channels/heads double and
    q pools (stride 2) at each stage-transition block; the kv stride
    halves at the same blocks (8 → 4 → 2 → 1), keeping the pooled key
    grid roughly constant."""
    blocks = []
    kv = kv_first
    prev = dims[0]
    for s, (depth, dim, head) in enumerate(zip(depths, dims, heads)):
        for b in range(depth):
            q_stride = 2 if (s > 0 and b == 0) else 1
            if q_stride > 1:
                kv = max(kv // 2, 1)
            blocks.append(MSBlockConfig(prev, dim, head, q_stride, kv))
            prev = dim
    return tuple(blocks)


def _pool_tokens(t, h, w, stride, kernel, name, dtype):
    """Per-head token pooling with the class token bypassed
    (torchvision ``Pool``): depthwise conv with head_dim filters SHARED
    across heads (torch runs the conv on (B·heads, head_dim, T, H, W)),
    then LayerNorm(head_dim) over class token + grid alike.

    t: (B, heads, 1+h·w, dh) → (B, heads, 1+h'·w', dh).
    """
    if kernel <= 1 and stride <= 1:
        return t, h, w
    b, nh, _, dh = t.shape
    cls_tok, grid = t[:, :, :1], t[:, :, 1:]
    g = grid.reshape(b * nh, h, w, dh)
    g = nn.Conv(dh, (kernel, kernel), (stride, stride),
                padding=((kernel // 2,) * 2, (kernel // 2,) * 2),
                feature_group_count=dh, use_bias=False, dtype=dtype,
                name=name)(g)
    h2, w2 = g.shape[1], g.shape[2]
    g = g.reshape(b, nh, h2 * w2, dh)
    out = jnp.concatenate([cls_tok, g], axis=2)
    # norm AFTER re-attaching the class token (Pool applies norm_act to
    # the concatenated stream)
    out = nn.LayerNorm(name=name + "_norm")(out)
    return out, h2, w2


def _interp_rel_table(table, new_len):
    """torchvision's runtime rel-pos resize (F.interpolate mode='linear',
    align_corners=False) as a conversion-time numpy op."""
    table = np.asarray(table, np.float32)
    old = table.shape[0]
    if old == new_len:
        return table
    src = (np.arange(new_len, dtype=np.float64) + 0.5) * old / new_len - 0.5
    src = np.clip(src, 0.0, old - 1)    # edge clamp BEFORE lo/frac, like
    lo = np.floor(src).astype(int)      # F.interpolate(align_corners=False)
    hi = np.clip(lo + 1, 0, old - 1)
    frac = (src - lo)[:, None]
    return (table[lo] * (1 - frac) + table[hi] * frac).astype(np.float32)


def _rel_pos_bias(q, rel_h, rel_w, qh, qw, kh, kw):
    """Decomposed relative positional bias (MViTv2 §3.1) over the GRID
    tokens: per-axis learned embeddings contracted with q.
    q: (B, H, Nq=qh·qw, d) — grid rows only (no class token)."""
    # index tables: delta between query/key grid coords, each axis scaled
    # when the two grids differ (q pooled vs k pooled at different rates) —
    # d(i,j) = i·max(k/q,1) − j·max(q/k,1) + (k−1)·max(q/k,1), the
    # get_rel_pos convention shared by the MViTv2/detectron2 reference code
    sh, sk = max(kh / qh, 1.0), max(qh / kh, 1.0)
    idx_h = (np.arange(qh)[:, None] * sh - np.arange(kh)[None] * sk
             + (kh - 1) * sk).astype(np.int32)
    sh, sk = max(kw / qw, 1.0), max(qw / kw, 1.0)
    idx_w = (np.arange(qw)[:, None] * sh - np.arange(kw)[None] * sk
             + (kw - 1) * sk).astype(np.int32)
    rh = rel_h[idx_h]                       # (qh, kh, d)
    rw = rel_w[idx_w]                       # (qw, kw, d)
    b, nh, _, d = q.shape
    qg = q.reshape(b, nh, qh, qw, d)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qg, rh.astype(q.dtype))
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qg, rw.astype(q.dtype))
    bias = bias_h[..., :, None] + bias_w[..., None, :]  # (b,nh,qh,qw,kh,kw)
    return bias.reshape(b, nh, qh * qw, kh * kw)


class MultiScaleAttention(nn.Module):
    """Pooling attention with residual pooling + decomposed rel-pos —
    torchvision ``MultiscaleAttention`` at T=1 (class token at index 0:
    bypasses pooling, excluded from the rel-pos bias and from the
    residual-pool shortcut per residual_with_cls_embed=False)."""
    dim_out: int
    heads: int
    q_stride: int = 1
    kv_stride: int = 1
    rel_pos: bool = True
    pool_kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        b, n, _ = x.shape
        nh = self.heads
        dh = self.dim_out // nh
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return jnp.swapaxes(t.reshape(b, -1, nh, dh), 1, 2)

        q, k, v = map(split_heads, (q, k, v))
        q, qh_, qw_ = _pool_tokens(q, h, w, self.q_stride,
                                   self.pool_kernel, "pool_q", self.dtype)
        k, kh_, kw_ = _pool_tokens(k, h, w, self.kv_stride,
                                   self.pool_kernel, "pool_k", self.dtype)
        v, _, _ = _pool_tokens(v, h, w, self.kv_stride,
                               self.pool_kernel, "pool_v", self.dtype)

        attn = (q @ jnp.swapaxes(k, -1, -2)) / jnp.sqrt(
            jnp.asarray(dh, q.dtype))
        if self.rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.normal(0.02),
                               (2 * max(qh_, kh_) - 1, dh))
            rel_w = self.param("rel_pos_w", nn.initializers.normal(0.02),
                               (2 * max(qw_, kw_) - 1, dh))
            # T=1 temporal table: a single row (converted checkpoints
            # interpolate torchvision's (2T−1, dh) table down to 1).  Its
            # bias is constant across GRID keys but torch adds it only to
            # attn[:, :, 1:, 1:] — the class COLUMN doesn't get it, so it
            # does NOT cancel in softmax and must be kept.
            rel_t = self.param("rel_pos_t", nn.initializers.normal(0.02),
                               (1, dh))
            # grid rows/cols only — torch adds the bias to
            # attn[:, :, 1:, 1:] (class token has no grid coordinate)
            bias = _rel_pos_bias(q[:, :, 1:], rel_h, rel_w,
                                 qh_, qw_, kh_, kw_)
            bias = bias + q[:, :, 1:] @ rel_t[0].astype(q.dtype)[:, None]
            attn = attn.at[:, :, 1:, 1:].add(bias)
        attn = nn.softmax(attn, axis=-1)
        out = attn @ v
        # residual pooling WITHOUT the class embedding
        # (mvit_v2_s: residual_with_cls_embed=False)
        out = out.at[:, :, 1:].add(q[:, :, 1:])
        out = jnp.swapaxes(out, 1, 2).reshape(b, -1, self.dim_out)
        out = nn.Dense(self.dim_out, dtype=self.dtype, name="project")(out)
        return out, qh_, qw_


class MultiScaleBlock(nn.Module):
    """torchvision ``MultiscaleBlock`` (proj_after_attn=True): norm1 →
    pooled attention (at the OUTPUT width); skip = project(norm1(x)) when
    widths differ, max-pooled (class token bypassed) when q pools; then
    norm2 → MLP with exact GELU."""
    cfg: MSBlockConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        c = self.cfg
        xn = nn.LayerNorm(name="norm1")(x)
        y, h2, w2 = MultiScaleAttention(
            c.out_dim, c.heads, c.q_stride, c.kv_stride,
            pool_kernel=c.pool_kernel, dtype=self.dtype,
            name="attn")(xn, h, w)
        skip = x
        if c.in_dim != c.out_dim:
            # v2 projects the NORMED stream (torchvision: project(x_norm1))
            skip = nn.Dense(c.out_dim, dtype=self.dtype,
                            name="project")(xn)
        if c.q_stride > 1:
            b, _, ch = skip.shape
            cls_tok, grid = skip[:, :1], skip[:, 1:]
            kp = c.q_stride + 1                 # torch: s+1 kernel, s stride
            g = grid.reshape(b, h, w, ch)
            g = nn.max_pool(g, (kp, kp), (c.q_stride, c.q_stride),
                            padding=((kp // 2,) * 2, (kp // 2,) * 2))
            skip = jnp.concatenate(
                [cls_tok, g.reshape(b, h2 * w2, ch)], axis=1)
        x = skip + y
        xn2 = nn.LayerNorm(name="norm2")(x)
        m = nn.gelu(nn.Dense(4 * c.out_dim, dtype=self.dtype,
                             name="mlp1")(xn2), approximate=False)
        m = nn.Dense(c.out_dim, dtype=self.dtype, name="mlp2")(m)
        return x + m, h2, w2


class MViTv2Encoder(nn.Module):
    """MViT-v2-S image encoder, weight-compatible with torchvision
    ``mvit_v2_s`` at T=1 (see the section comment): (7,7)/s4 conv
    patchify + class token → 16 multiscale blocks → LayerNorm →
    class-token readout → head to ``out_dim`` (the reference replaces
    the classifier with Linear(768, 512), mvit_v2.py:16-17)."""
    depths: tuple = (1, 2, 11, 2)
    dims: tuple = (96, 192, 384, 768)
    heads: tuple = (1, 2, 4, 8)
    kv_first: int = 8
    out_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3)
        x = nn.Conv(self.dims[0], (7, 7), (4, 4),
                    padding=((3, 3), (3, 3)), dtype=self.dtype,
                    name="conv_proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        cls = self.param("cls_token", nn.initializers.zeros, (c,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c)), x], axis=1)
        for i, bc in enumerate(mvit_v2_s_blocks(
                self.depths, self.dims, self.heads, self.kv_first)):
            x, h, w = MultiScaleBlock(bc, dtype=self.dtype,
                                      name=f"block{i}")(x, h, w)
        x = nn.LayerNorm(name="norm")(x)[:, 0]      # class-token readout
        return nn.Dense(self.out_dim, dtype=self.dtype, name="head")(x)
