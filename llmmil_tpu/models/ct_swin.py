"""SwinUNETR-style crop-MIL CT encoder.

Parity target: ``model/dim3/swinUNETR.py:8-65`` — sample ``n_subsample``
random 96³ crops from the CT volume, encode each with a hierarchical 3-D
window-attention transformer (MONAI swinViT stage-4, 768-d, avg-pooled), then
gated-attention MIL pooling over the crops.  The reference's frozen MONAI
weights are an absent external asset, so this is a capability-equivalent
TPU-native encoder: same crop-MIL structure, same 768-d stage-4 feature, with
non-shifted 3-D window attention (windows are jit-static reshapes — no
dynamic shapes) and 8-neighbour patch merging.

``wMask`` variant (swinUNETR_wMask.py:48-77): crops constrained around the
tumour-mask centre — pass ``center`` and a small jitter replaces free
sampling.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masked import masked_softmax


class _WindowBlock3D(nn.Module):
    dim: int
    heads: int
    window: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape

        def axis_window(dim):
            ws = min(self.window, dim)
            return ws if dim % ws == 0 else dim   # whole-axis fallback

        wd, wh, ww_ = axis_window(d), axis_window(h), axis_window(w)
        y = nn.LayerNorm(name="ln1")(x)
        y = y.reshape(b, d // wd, wd, h // wh, wh, w // ww_, ww_, c)
        y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            -1, wd * wh * ww_, c)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(y, y)
        y = y.reshape(b, d // wd, h // wh, w // ww_, wd, wh, ww_, c)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)
        x = x + y
        y = nn.LayerNorm(name="ln2")(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(y)
        return x + y


class _PatchMerge3D(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        pad = [(0, d % 2), (0, h % 2), (0, w % 2)]
        if any(p[1] for p in pad):
            x = jnp.pad(x, ((0, 0), *pad, (0, 0)))
            b, d, h, w, c = x.shape
        x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, d // 2, h // 2, w // 2, 8 * c)
        x = nn.LayerNorm(name="ln")(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name="reduce")(x)


class SwinViT3D(nn.Module):
    """Hierarchical 3-D window transformer: 96³ crop → 768-d feature."""
    embed_dim: int = 48
    depths: tuple = (2, 2, 2, 2)
    heads: tuple = (3, 6, 12, 24)
    window: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # patch embed: 2³ patches
        x = nn.Conv(self.embed_dim, (2, 2, 2), (2, 2, 2), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        dim = self.embed_dim
        for s, (depth, h) in enumerate(zip(self.depths, self.heads)):
            for i in range(depth):
                x = _WindowBlock3D(dim, h, self.window, self.dtype,
                                   name=f"stage{s}_block{i}")(x)
            dim *= 2
            x = _PatchMerge3D(dim, self.dtype, name=f"merge{s}")(x)
        return x.mean(axis=(1, 2, 3))        # (B, 768)


def _random_crop_starts(rng, batch, n_crops, vol_shape, crop, center=None,
                        jitter: int = 8):
    """(B, n_crops, 3) int32 crop origins, independent per sample;
    constrained near per-sample ``center`` (B, 3) when given (wMask)."""
    maxs = jnp.array([max(s - c, 1) for s, c in zip(vol_shape, crop)])
    u = jax.random.uniform(rng, (batch, n_crops, 3))
    if center is None:
        return (u * maxs).astype(jnp.int32)
    center = jnp.asarray(center)
    if center.ndim == 1:
        center = jnp.broadcast_to(center, (batch, 3))
    lo = jnp.maximum(center - jnp.array(crop) // 2 - jitter, 0)  # (B, 3)
    hi = jnp.minimum(lo + 2 * jitter, maxs)
    return (lo[:, None] + u * (hi - lo)[:, None]).astype(jnp.int32)


class SwinUNETRMIL(nn.Module):
    """Crop-sample → SwinViT3D → gated-attention MIL over crops
    (swinUNETR.py:27-65).  Returns (B, 768) pooled feature.

    ``crop_chunk``: encode the crops ``crop_chunk`` at a time via an
    ``nn.scan`` loop (one compiled encoder body, runtime iteration) instead
    of one giant batch — peak activation memory is one chunk's.  The
    reference's 100×96³ crop load OOMs a 16 GB chip when batched whole
    (measured: 16.99 G program HBM, zoo bench r3); chunk 25 fits.  0 = all
    at once.  Numerics identical either way (same params, same crops).
    """
    n_subsample: int = 100
    crop: tuple = (96, 96, 96)
    att_dim: int = 192
    crop_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rng=None, center=None, train: bool = False):
        b = x.shape[0]
        vol_shape = x.shape[1:4]
        if rng is None:
            rng = self.make_rng("crops") if train else jax.random.PRNGKey(0)
        starts = _random_crop_starts(rng, b, self.n_subsample, vol_shape,
                                     self.crop, center)      # (B, n, 3)

        def crop_one(xb, start):               # pure slicing → vmap-safe
            return jax.lax.dynamic_slice(
                xb, (start[0], start[1], start[2], 0),
                (*self.crop, xb.shape[-1]))

        # per-sample crops at per-sample coordinates
        crops = jax.vmap(lambda xb, st: jax.vmap(
            lambda s: crop_one(xb, s))(st))(x, starts)       # (B, n, ...)
        crops = crops.reshape(b * self.n_subsample, *self.crop,
                              x.shape[-1])
        enc = SwinViT3D(dtype=self.dtype, name="swinvit")
        nc = b * self.n_subsample
        if self.crop_chunk and self.crop_chunk < nc:
            k = self.crop_chunk
            n_chunks = -(-nc // k)
            pad = n_chunks * k - nc
            if pad:
                crops = jnp.concatenate(
                    [crops, jnp.zeros((pad, *crops.shape[1:]),
                                      crops.dtype)], axis=0)
            chunked = crops.reshape(n_chunks, k, *crops.shape[1:])

            def body(mdl, carry, xs):
                return carry, mdl(xs)

            # remat the body so the one-chunk memory bound holds under
            # grad too (scan would otherwise stack every chunk's
            # residuals — as large as the unchunked pass)
            _, feats = nn.scan(
                nn.remat(body), variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=0)(enc, None, chunked)
            feats = feats.reshape(n_chunks * k, -1)[:nc]
        else:
            # one batched encoder pass over all crops (vs the reference's
            # python loop, swinUNETR.py:50-57) — a single big MXU workload
            feats = enc(crops)
        feats = feats.reshape(b, self.n_subsample, -1)  # (B, n, 768)

        # in-module gated-attention MIL over crops (swinUNETR.py:33-44)
        a_v = jnp.tanh(nn.Dense(self.att_dim, dtype=self.dtype,
                                name="attention_V")(feats))
        a_u = nn.sigmoid(nn.Dense(self.att_dim, dtype=self.dtype,
                                  name="attention_U")(feats))
        a = nn.Dense(1, dtype=self.dtype, name="attention_weights")(a_v * a_u)
        att = masked_softmax(jnp.swapaxes(a, -1, -2), None, axis=-1)
        return (att @ feats)[:, 0]                      # (B, 768)
