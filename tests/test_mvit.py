"""MViT-v2 chunk encoder: shapes + pooling-attention numerics vs a torch
mini (same math, shared weights).  Parity target: the reference's
torchvision ``mvit_v2_s`` chunk encoder (model/dim3/mvit_v2.py:15-27)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from llmmil_tpu.models.ct_mvit import (MViTChunked, MViTv2Encoder,
                                       MultiScaleAttention)


def test_mvitv2_encoder_shapes():
    enc = MViTv2Encoder(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                        heads=(1, 2, 4, 8))
    x = jnp.ones((2, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 512)
    assert np.all(np.isfinite(np.asarray(out)))


def test_mvit_chunked_v2_in_model():
    m = MViTChunked(n_classes=2, arch="v2_s", depths=(1, 1, 1, 1),
                    dims=(8, 16, 32, 64), heads=(1, 2, 4, 8))
    x = jnp.ones((1, 7, 32, 32, 1))          # 7 slices → 3 chunks (pad 2)
    params = m.init(jax.random.PRNGKey(0), x)
    emb, attns = m.apply(params, x)
    assert emb.shape == (1, 512)
    assert len(attns) == 2


def test_mvitv2_pooling_attention_vs_torch():
    """MultiScaleAttention (q/kv conv pooling + rel-pos + residual pooling)
    matches an independently-written torch implementation with the same
    weights."""
    dim, dim_out, heads, h, w = 8, 16, 2, 8, 8
    q_stride, kv_stride, ker = 2, 2, 3
    rs = np.random.RandomState(0)
    x = rs.randn(2, h * w, dim).astype(np.float32)

    mod = MultiScaleAttention(dim_out=dim_out, heads=heads,
                              q_stride=q_stride, kv_stride=kv_stride)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), h, w)["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), h, w)[0])

    # ---- torch twin --------------------------------------------------------
    p = jax.tree_util.tree_map(np.asarray, params)
    xt = torch.tensor(x)
    qkv = xt @ torch.tensor(p["qkv"]["kernel"]) \
        + torch.tensor(p["qkv"]["bias"])
    q, k, v = qkv.split(dim_out, dim=-1)

    def pool(t, name, stride):
        # (B, N, C) → grid NCHW → depthwise conv(3, stride, pad 1) → LN
        t = t.reshape(2, h, w, dim_out).permute(0, 3, 1, 2)
        wk = torch.tensor(p[f"{name}_pool"]["kernel"])  # (3,3,1,C) HWIO
        wk = wk.permute(3, 2, 0, 1)                     # OIHW, I=1 (dw)
        t = F.conv2d(t, wk, stride=stride, padding=ker // 2,
                     groups=dim_out)
        h2, w2 = t.shape[2], t.shape[3]
        t = t.permute(0, 2, 3, 1).reshape(2, h2 * w2, dim_out)
        t = F.layer_norm(t, (dim_out,),
                         torch.tensor(p[f"{name}_norm"]["scale"]),
                         torch.tensor(p[f"{name}_norm"]["bias"]))
        return t, h2, w2

    q, qh, qw = pool(q, "q", q_stride)
    k, kh, kw = pool(k, "k", kv_stride)
    v, _, _ = pool(v, "v", kv_stride)
    dh = dim_out // heads

    def split(t):
        return t.reshape(2, -1, heads, dh).transpose(1, 2)

    qh_t, kh_t, vh_t = split(q), split(k), split(v)
    attn = qh_t @ kh_t.transpose(-1, -2) / dh ** 0.5
    # decomposed rel-pos (get_rel_pos convention, equal grids → idx i-j+k-1)
    rel_h = torch.tensor(p["rel_pos_h"])
    rel_w = torch.tensor(p["rel_pos_w"])
    idx = np.arange(qh)[:, None] - np.arange(kh)[None] + kh - 1
    rh, rw = rel_h[idx], rel_w[idx]
    qg = qh_t.reshape(2, heads, qh, qw, dh)
    bias = (torch.einsum("bnhwd,hkd->bnhwk", qg, rh)[..., :, None]
            + torch.einsum("bnhwd,wkd->bnhwk", qg, rw)[..., None, :])
    attn = attn + bias.reshape(2, heads, qh * qw, kh * kw)
    out = torch.softmax(attn, -1) @ vh_t + qh_t          # residual pooling
    out = out.transpose(1, 2).reshape(2, -1, dim_out)
    want = (out @ torch.tensor(p["proj"]["kernel"])
            + torch.tensor(p["proj"]["bias"])).detach().numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
