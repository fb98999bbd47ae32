"""MViT-v2 chunk encoder: shapes + FULL-ENCODER parity vs a hand-built
torch twin of torchvision ``models.video.mvit_v2_s`` (T=1), including the
``convert_mvit_v2_state_dict`` weight import.  Parity target: the
reference's chunk encoder (model/dim3/mvit_v2.py:15-27).

The torch twin mirrors torchvision video/mvit.py structure AND state-dict
naming (Pool with per-head depthwise Conv3d + LayerNorm(head_dim) and
class-token bypass, fused qkv, decomposed rel-pos incl. the temporal
table — which biases grid keys but not the class column, so it must be
kept even at T=1), residual pooling without the class embedding,
proj_after_attn skip."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from llmmil_tpu.models.ct_mvit import (MViTChunked, MViTv2Encoder,
                                       _interp_rel_table,
                                       mvit_v2_s_blocks)
from llmmil_tpu.models.torch_import import (convert_mvit_v2_state_dict,
                                            _pooled_size)


def test_mvitv2_encoder_shapes():
    enc = MViTv2Encoder(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                        heads=(1, 2, 4, 8), kv_first=2)
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


# ---- torch twin of torchvision video/mvit.py (T=1) -------------------------

class _TVPool(tnn.Module):
    def __init__(self, pool, norm):
        super().__init__()
        self.pool = pool
        self.norm_act = tnn.Sequential(norm) if norm is not None else None

    def forward(self, x, thw):
        cls_tok, grid = x[:, :, :1], x[:, :, 1:]
        b, h, _, d = grid.shape
        t, hh, ww = thw
        g = grid.transpose(2, 3).reshape(b * h, d, t, hh, ww)
        g = self.pool(g)
        thw2 = tuple(g.shape[2:])
        g = g.reshape(b, h, d, -1).transpose(2, 3)
        x = torch.cat((cls_tok, g), dim=2)
        if self.norm_act is not None:
            x = self.norm_act(x)
        return x, thw2


def _rel_idx(qn, kn):
    sh, sk = max(kn / qn, 1.0), max(qn / kn, 1.0)
    return (np.arange(qn)[:, None] * sh - np.arange(kn)[None] * sk
            + (kn - 1) * sk).astype(int)


class _TVAttn(tnn.Module):
    def __init__(self, in_dim, out_dim, heads, q_stride, kv_stride, grid):
        super().__init__()
        self.heads, self.out_dim = heads, out_dim
        dh = out_dim // heads
        self.qkv = tnn.Linear(in_dim, 3 * out_dim)
        self.project = tnn.Sequential(tnn.Linear(out_dim, out_dim))

        def mk(s):
            return _TVPool(
                tnn.Conv3d(dh, dh, (3, 3, 3), (1, s, s), (1, 1, 1),
                           groups=dh, bias=False), tnn.LayerNorm(dh, eps=1e-6))

        self.pool_q = mk(q_stride)
        self.pool_k = mk(kv_stride)
        self.pool_v = mk(kv_stride)
        qs = _pooled_size(grid, q_stride)
        ks = _pooled_size(grid, kv_stride)
        rel = 2 * max(qs, ks) - 1
        self.rel_pos_h = tnn.Parameter(torch.randn(rel, dh) * 0.02)
        self.rel_pos_w = tnn.Parameter(torch.randn(rel, dh) * 0.02)
        # temporal table: ACTIVE in this twin (torchvision has it); the
        # jax side drops it — the parity assert below proves the T=1
        # softmax invariance
        self.rel_pos_t = tnn.Parameter(torch.randn(1, dh) * 0.02)

    def forward(self, x, thw):
        b, n, _ = x.shape
        dh = self.out_dim // self.heads
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, dh).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, q_thw = self.pool_q(q, thw)
        k, k_thw = self.pool_k(k, thw)
        v, _ = self.pool_v(v, thw)
        attn = (q * dh ** -0.5) @ k.transpose(-2, -1)
        qh, qw = q_thw[1], q_thw[2]
        kh, kw = k_thw[1], k_thw[2]
        qg = q[:, :, 1:].reshape(b, self.heads, qh, qw, dh)
        rh = self.rel_pos_h[_rel_idx(qh, kh)]
        rw = self.rel_pos_w[_rel_idx(qw, kw)]
        bias = (torch.einsum("bnhwd,hkd->bnhwk", qg, rh)[..., :, None]
                + torch.einsum("bnhwd,wkd->bnhwk", qg, rw)[..., None, :])
        bias = bias.reshape(b, self.heads, qh * qw, kh * kw)
        # temporal term at T=1: same value for every key column
        bias = bias + (q[:, :, 1:] @ self.rel_pos_t[0][:, None])
        attn = attn.clone()
        attn[:, :, 1:, 1:] = attn[:, :, 1:, 1:] + bias
        attn = torch.softmax(attn, dim=-1)
        x = attn @ v
        # residual pooling, residual_with_cls_embed=False
        x = x.clone()
        x[:, :, 1:] = x[:, :, 1:] + q[:, :, 1:]
        x = x.transpose(1, 2).reshape(b, -1, self.out_dim)
        return self.project(x), q_thw


class _TVBlock(tnn.Module):
    def __init__(self, cfg, grid):
        super().__init__()
        self.cfg = cfg
        self.norm1 = tnn.LayerNorm(cfg.in_dim, eps=1e-6)
        self.norm2 = tnn.LayerNorm(cfg.out_dim, eps=1e-6)
        self.attn = _TVAttn(cfg.in_dim, cfg.out_dim, cfg.heads,
                            cfg.q_stride, cfg.kv_stride, grid)
        self.mlp = tnn.Sequential(
            tnn.Linear(cfg.out_dim, 4 * cfg.out_dim), tnn.GELU(),
            tnn.Dropout(0.0), tnn.Linear(4 * cfg.out_dim, cfg.out_dim),
            tnn.Dropout(0.0))
        self.project = (tnn.Linear(cfg.in_dim, cfg.out_dim)
                        if cfg.in_dim != cfg.out_dim else None)
        self.pool_skip = None
        if cfg.q_stride > 1:
            kp = cfg.q_stride + 1
            self.pool_skip = _TVPool(
                tnn.MaxPool3d((1, kp, kp), (1, cfg.q_stride, cfg.q_stride),
                              (0, kp // 2, kp // 2)), None)

    def forward(self, x, thw):
        xn = self.norm1(x)
        y, thw2 = self.attn(xn, thw)
        skip = x if self.project is None else self.project(xn)
        if self.pool_skip is not None:
            skip = self.pool_skip(skip.unsqueeze(1), thw)[0].squeeze(1)
        x = skip + y
        return x + self.mlp(self.norm2(x)), thw2


class _TVMViT(tnn.Module):
    class _PE(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.class_token = tnn.Parameter(torch.zeros(c))

    def __init__(self, depths, dims, heads, kv_first, grid, out_dim=512):
        super().__init__()
        self.conv_proj = tnn.Conv3d(3, dims[0], (3, 7, 7), (2, 4, 4),
                                    (1, 3, 3))
        self.pos_encoding = self._PE(dims[0])
        cfgs = mvit_v2_s_blocks(depths, dims, heads, kv_first)
        self.blocks = tnn.ModuleList()
        g = grid
        for c in cfgs:
            self.blocks.append(_TVBlock(c, g))
            g = _pooled_size(g, c.q_stride)
        self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
        self.head = tnn.Sequential(tnn.Dropout(0.0),
                                   tnn.Linear(dims[-1], out_dim))

    def forward(self, x):                       # (B, 3, 1, H, W)
        x = self.conv_proj(x)
        b, c, t, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        cls_tok = self.pos_encoding.class_token.expand(b, -1).unsqueeze(1)
        x = torch.cat((cls_tok, x), dim=1)
        thw = (t, h, w)
        for blk in self.blocks:
            x, thw = blk(x, thw)
        return self.head(self.norm(x)[:, 0])


def test_mvitv2_full_encoder_matches_torch_twin():
    depths, dims, heads = (1, 1, 1, 1), (8, 16, 32, 64), (1, 2, 4, 8)
    kv_first, hw = 2, 32
    torch.manual_seed(0)
    twin = _TVMViT(depths, dims, heads, kv_first, grid=hw // 4).eval()
    # class token must matter in the comparison
    with torch.no_grad():
        twin.pos_encoding.class_token.normal_(0, 0.5)

    x = torch.randn(2, 3, 1, hw, hw)
    with torch.no_grad():
        want = twin(x).numpy()

    params, dropped = convert_mvit_v2_state_dict(
        twin.state_dict(),
        blocks=mvit_v2_s_blocks(depths, dims, heads, kv_first))
    assert dropped == []          # every torch param maps (incl. rel_pos_t)
    enc = MViTv2Encoder(depths=depths, dims=dims, heads=heads,
                        kv_first=kv_first)
    xj = jnp.asarray(x.numpy()[:, :, 0].transpose(0, 2, 3, 1))  # NHWC
    got = np.asarray(enc.apply({"params": params}, xj))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_interp_rel_table_matches_torch_interpolate():
    rs = np.random.RandomState(0)
    table = rs.randn(11, 8).astype(np.float32)
    for new_len in (5, 11, 23):
        got = _interp_rel_table(table, new_len)
        want = F.interpolate(
            torch.tensor(table).t().unsqueeze(0), size=new_len,
            mode="linear", align_corners=False)[0].t().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mvit_v2_s_block_setting():
    """The 16-block mvit_v2_s schedule: channels/heads double and q pools
    at blocks 1, 3, 14 (stage transitions of depths 1/2/11/2); kv stride
    8 → 4 → 2 → 1."""
    blocks = mvit_v2_s_blocks()
    assert len(blocks) == 16
    assert [b.q_stride for b in blocks] == \
        [1, 2, 1, 2] + [1] * 10 + [2, 1]
    assert [b.kv_stride for b in blocks] == \
        [8, 4, 4, 2] + [2] * 10 + [1, 1]
    assert [b.out_dim for b in blocks] == \
        [96, 192, 192] + [384] * 11 + [768, 768]
    assert [b.heads for b in blocks] == [1, 2, 2] + [4] * 11 + [8, 8]
    # head_dim constant at 96 (torchvision pool convs are 96-channel)
    assert all(b.out_dim // b.heads == 96 for b in blocks)
