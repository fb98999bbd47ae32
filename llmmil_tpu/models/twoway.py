"""SAM-style two-way cross-attention fusion.

Parity targets: ``model/sam/transformer.py:10-120`` (TwoWayTransformer),
``:236-309`` (TwoWayAttentionBlock), ``:395-449`` (downsampled Attention) and
``model/sam/common.py:13-26`` (MLPBlock).  Differences from the reference are
TPU-idiomatic only: NDHWC feature maps, optional key-validity masks on every
cross-attention (the reference attends to zero-padded bag rows unmasked), and
batched einsum attention that XLA fuses onto the MXU.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from ..ops.dynquant import attn_dot
from ..ops.masked import masked_softmax


class MLPBlock(nn.Module):
    """lin2(act(lin1(x))) — common.py:13-26 (ReLU as instantiated)."""
    mlp_dim: int = 2048
    out_dim: int = 512
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = self.act(nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, name="lin2")(x)


class Attention(nn.Module):
    """MHA with optional internal-dim downsampling (transformer.py:395-449)
    plus key masking."""
    embedding_dim: int = 512
    num_heads: int = 8
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_mask=None):
        internal = self.embedding_dim // self.downsample_rate
        assert internal % self.num_heads == 0
        dh = internal // self.num_heads
        b = q.shape[0]

        def proj(x, name):
            y = nn.Dense(internal, dtype=self.dtype, name=name)(x)
            return jnp.swapaxes(y.reshape(b, -1, self.num_heads, dh), 1, 2)

        qh, kh, vh = proj(q, "q_proj"), proj(k, "k_proj"), proj(v, "v_proj")
        if key_mask is not None:
            # zero masked value rows so non-finite padding can't poison
            # the attn @ v matmul through 0·NaN
            vh = jnp.where(key_mask[:, None, :, None], vh, 0.0)
        # attn_dot: plain matmuls by default; the serving-only two-sided
        # dynamic-int8 path under dynamic_int8_attention() (ops/dynquant)
        attn = attn_dot(qh, jnp.swapaxes(kh, -1, -2), kind="score") / jnp.sqrt(
            jnp.asarray(dh, dtype=qh.dtype))
        m = key_mask[:, None, None, :] if key_mask is not None else None
        attn = masked_softmax(attn, m, axis=-1)
        out = attn_dot(attn, vh)                            # (B,H,Nq,dh)
        out = jnp.swapaxes(out, 1, 2).reshape(b, -1, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype,
                        name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """query self-attn → token→image cross → MLP → image→token cross
    (transformer.py:278-309)."""
    embedding_dim: int = 512
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe,
                 query_mask=None, key_mask=None):
        dt = self.dtype
        if self.skip_first_layer_pe:
            queries = Attention(self.embedding_dim, self.num_heads,
                                dtype=dt, name="self_attn")(
                queries, queries, queries, key_mask=query_mask)
        else:
            q = queries + query_pe
            attn_out = Attention(self.embedding_dim, self.num_heads,
                                 dtype=dt, name="self_attn")(
                q, q, queries, key_mask=query_mask)
            queries = queries + attn_out
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(self.embedding_dim, self.num_heads,
                             self.attention_downsample_rate, dtype=dt,
                             name="cross_attn_token_to_image")(
            q, k, keys, key_mask=key_mask)
        queries = nn.LayerNorm(name="norm2")(queries + attn_out)

        mlp_out = MLPBlock(self.mlp_dim, self.embedding_dim,
                           nn.relu, dtype=dt, name="mlp")(queries)
        queries = nn.LayerNorm(name="norm3")(queries + mlp_out)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(self.embedding_dim, self.num_heads,
                             self.attention_downsample_rate, dtype=dt,
                             name="cross_attn_image_to_token")(
            k, q, queries, key_mask=query_mask)
        keys = nn.LayerNorm(name="norm4")(keys + attn_out)

        return queries, keys


class TwoWayAttentionBlock2(nn.Module):
    """Variant adding image-side self-attention per block (parity:
    ``model/sam/transformer.py:312-392`` TwoWayAttentionBlock2 — unreferenced
    in the reference's entry points but part of its surface)."""
    embedding_dim: int = 512
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe,
                 query_mask=None, key_mask=None):
        dt = self.dtype
        if self.skip_first_layer_pe:
            queries = Attention(self.embedding_dim, self.num_heads,
                                dtype=dt, name="self_attn_token")(
                queries, queries, queries, key_mask=query_mask)
            keys = Attention(self.embedding_dim, self.num_heads,
                             dtype=dt, name="self_attn_image")(
                keys, keys, keys, key_mask=key_mask)
        else:
            q = queries + query_pe
            queries = queries + Attention(
                self.embedding_dim, self.num_heads, dtype=dt,
                name="self_attn_token")(q, q, queries,
                                        key_mask=query_mask)
            k = keys + key_pe
            keys = keys + Attention(
                self.embedding_dim, self.num_heads, dtype=dt,
                name="self_attn_image")(k, k, keys, key_mask=key_mask)
        queries = nn.LayerNorm(name="norm1_token")(queries)
        keys = nn.LayerNorm(name="norm1_image")(keys)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(self.embedding_dim, self.num_heads,
                             self.attention_downsample_rate, dtype=dt,
                             name="cross_attn_token_to_image")(
            q, k, keys, key_mask=key_mask)
        queries = nn.LayerNorm(name="norm2")(queries + attn_out)

        mlp_out = MLPBlock(self.mlp_dim, self.embedding_dim,
                           nn.relu, dtype=dt, name="mlp")(queries)
        queries = nn.LayerNorm(name="norm3")(queries + mlp_out)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(self.embedding_dim, self.num_heads,
                             self.attention_downsample_rate, dtype=dt,
                             name="cross_attn_image_to_token")(
            k, q, queries, key_mask=query_mask)
        keys = nn.LayerNorm(name="norm4")(keys + attn_out)
        return queries, keys


def tokens_from_feature_map(x: jnp.ndarray, reduce: str) -> jnp.ndarray:
    """5-D NDHWC CT feature map → token sequence (transformer.py:78-98).

    reduce='mean': (B,T,H,W,C) → (B,T,C) spatial mean (resnetMC3 path);
    reduce='flatten': (B,T,H,W,C) → (B,T·H·W,C) (medicalNet path).
    """
    if x.ndim != 5:
        return x
    if reduce == "mean":
        return x.mean(axis=(2, 3))
    b, t, h, w, c = x.shape
    return x.reshape(b, t * h * w, c)


class TwoWayTransformer2(nn.Module):
    """TwoWayTransformer with image-side self-attention blocks (parity:
    ``model/sam/transformer.py:123-233``)."""
    depth: int = 2
    embedding_dim: int = 512
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    ct_reduce: str = "mean"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding,
                 image_mask=None, point_mask=None):
        image_embedding = tokens_from_feature_map(image_embedding,
                                                  self.ct_reduce)
        point_embedding = tokens_from_feature_map(point_embedding,
                                                  self.ct_reduce)
        if image_pe.ndim == 2:
            image_pe = image_pe[None]
        queries, keys = point_embedding, image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock2(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(
                queries, keys, point_embedding, image_pe,
                query_mask=point_mask, key_mask=image_mask)
        q = queries + point_embedding
        k = keys + image_pe
        attn_out = Attention(self.embedding_dim, self.num_heads,
                             self.attention_downsample_rate,
                             dtype=self.dtype,
                             name="final_attn_token_to_image")(
            q, k, keys, key_mask=image_mask)
        queries = nn.LayerNorm(name="norm_final_attn")(queries + attn_out)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Bidirectional cross-attention aligner (transformer.py:10-120).

    ``image_embedding``/``point_embedding`` may be (B, N, C) token streams or
    5-D NDHWC CT maps; 5-D inputs are tokenised per ``ct_reduce``.  When
    ``alignment_base == 'CT'`` the CT map arrives as the *point* side
    (transformer.py:78-87), otherwise as the image side.
    Returns (queries, keys).
    """
    depth: int = 2
    embedding_dim: int = 512
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    ct_reduce: str = "mean"          # 'mean' (resnetMC3) | 'flatten' (medicalNet)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding,
                 image_mask=None, point_mask=None):
        image_embedding = tokens_from_feature_map(image_embedding,
                                                  self.ct_reduce)
        point_embedding = tokens_from_feature_map(point_embedding,
                                                  self.ct_reduce)
        if image_pe.ndim == 2:
            image_pe = image_pe[None]

        queries, keys = point_embedding, image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(
                queries, keys, point_embedding, image_pe,
                query_mask=point_mask, key_mask=image_mask)

        q = queries + point_embedding
        k = keys + image_pe
        attn_out = Attention(self.embedding_dim, self.num_heads,
                             self.attention_downsample_rate, dtype=self.dtype,
                             name="final_attn_token_to_image")(
            q, k, keys, key_mask=image_mask)
        queries = nn.LayerNorm(name="norm_final_attn")(queries + attn_out)
        return queries, keys
