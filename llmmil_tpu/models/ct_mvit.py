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
    ``return self.TransMIL(x_features)`` (mvit_v2.py:27)."""
    n_classes: int = 2
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
        feats = _ChunkViT(dtype=self.dtype, name="chunk_vit")(chunks)
        feats = feats.reshape(b, n_chunks, 512)
        return TransMIL(n_classes=self.n_classes, L=512, dtype=self.dtype,
                        name="transmil")(feats, train=train)
