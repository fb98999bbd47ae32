"""Model-layer tests: parity vs independently-written torch minis + smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import llmmil_tpu.models as M
from llmmil_tpu.config import Config


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# ABMIL parity vs a torch re-implementation with identical weights
# ---------------------------------------------------------------------------

def test_abmil_matches_torch():
    import torch
    import torch.nn as tnn

    L, D, K, N = 16, 8, 1, 12
    rs = np.random.RandomState(0)
    x = rs.randn(1, N, L).astype(np.float32)

    tv = tnn.Linear(L, D)
    tu = tnn.Linear(L, D)
    tw = tnn.Linear(D, K)
    with torch.no_grad():
        xt = torch.tensor(x[0])
        a = tw(torch.tanh(tv(xt)) * torch.sigmoid(tu(xt)))   # (N, K)
        att = torch.softmax(a.T, dim=1)
        want = (att @ xt).numpy()

    model = M.ABMIL(L=L, D=D, K=K)
    params = {
        "V_kernel": tv.weight.detach().numpy().T,
        "V_bias": tv.bias.detach().numpy(),
        "U_kernel": tu.weight.detach().numpy().T,
        "U_bias": tu.bias.detach().numpy(),
        "w_kernel": tw.weight.detach().numpy().T,
        "w_bias": tw.bias.detach().numpy(),
    }
    pooled, att_j = model.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(_np(pooled[0]), want, atol=1e-5)


def test_abmil_v2_appends_bprc():
    model = M.ABMILv2(L=8, D=4)
    x = jnp.ones((2, 5, 8))
    bprc = jnp.array([[0.0], [1.0]])
    params = model.init(jax.random.PRNGKey(0), x, bprc)
    pooled, _ = model.apply(params, x, bprc)
    assert pooled.shape == (2, 1, 9)
    assert pooled[0, 0, -1] == 0.0 and pooled[1, 0, -1] == 1.0


# ---------------------------------------------------------------------------
# TwoWay attention parity vs torch mini
# ---------------------------------------------------------------------------

def test_downsampled_attention_matches_torch():
    import math
    import torch
    import torch.nn as tnn

    dim, heads, rate = 16, 2, 2
    internal = dim // rate
    rs = np.random.RandomState(1)
    q = rs.randn(1, 5, dim).astype(np.float32)
    k = rs.randn(1, 7, dim).astype(np.float32)
    v = rs.randn(1, 7, dim).astype(np.float32)

    tq, tk, tv_, to = (tnn.Linear(dim, internal), tnn.Linear(dim, internal),
                       tnn.Linear(dim, internal), tnn.Linear(internal, dim))
    with torch.no_grad():
        qh = tq(torch.tensor(q)).reshape(1, 5, heads, -1).transpose(1, 2)
        kh = tk(torch.tensor(k)).reshape(1, 7, heads, -1).transpose(1, 2)
        vh = tv_(torch.tensor(v)).reshape(1, 7, heads, -1).transpose(1, 2)
        attn = torch.softmax(
            qh @ kh.transpose(-1, -2) / math.sqrt(internal // heads), dim=-1)
        out = (attn @ vh).transpose(1, 2).reshape(1, 5, internal)
        want = to(out).numpy()

    def lin(m):
        return {"kernel": m.weight.detach().numpy().T,
                "bias": m.bias.detach().numpy()}

    params = {"q_proj": lin(tq), "k_proj": lin(tk), "v_proj": lin(tv_),
              "out_proj": lin(to)}
    att = M.Attention(embedding_dim=dim, num_heads=heads,
                      downsample_rate=rate)
    got = att.apply({"params": params}, jnp.array(q), jnp.array(k),
                    jnp.array(v))
    np.testing.assert_allclose(_np(got), want, atol=1e-5)


def test_twoway_transformer_shapes_and_mask():
    tw = M.TwoWayTransformer(depth=2, embedding_dim=32, num_heads=4,
                             mlp_dim=64)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 20, 32))       # bag tokens
    pe = jax.random.normal(rng, (20, 32))
    pts = jax.random.normal(rng, (2, 3, 32))        # CI tokens
    params = tw.init(rng, img, pe, pts)
    q, k = tw.apply(params, img, pe, pts)
    assert q.shape == (2, 3, 32) and k.shape == (2, 20, 32)

    # masked padded bag == truncated bag (queries side)
    n_valid = 12
    img_pad = img.at[:, n_valid:].set(0.0)
    mask = jnp.arange(20)[None, :] < n_valid
    q_m, _ = tw.apply(params, img_pad, pe, pts, image_mask=mask)
    q_t, _ = tw.apply(params, img[:, :n_valid], pe[:n_valid], pts)
    np.testing.assert_allclose(_np(q_m), _np(q_t), atol=1e-4)


def test_twoway_accepts_5d_ct_map():
    tw = M.TwoWayTransformer(depth=2, embedding_dim=16, num_heads=4,
                             mlp_dim=32, ct_reduce="mean")
    rng = jax.random.PRNGKey(1)
    ct = jax.random.normal(rng, (1, 6, 4, 4, 16))   # NDHWC map
    pe = jax.random.normal(rng, (6, 16))
    pts = jax.random.normal(rng, (1, 2, 16))
    params = tw.init(rng, ct, pe, pts)
    q, k = tw.apply(params, ct, pe, pts)
    assert q.shape == (1, 2, 16) and k.shape == (1, 6, 16)


def test_im2col_conv_matches_lax_conv():
    """LowChannelConv3D's im2col path ≡ lax 3-D conv (the stem formulation
    that avoids XLA's 21-GiB weight-grad relayout on 1-channel volumes)."""
    from jax import lax
    from llmmil_tpu.models.ct_mc3 import im2col_conv

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 6, 12, 12, 1), jnp.float32)
    k = jnp.asarray(rs.randn(3, 4, 4, 1, 3) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(3) * 0.1, jnp.float32)
    want = lax.conv_general_dilated(
        x, k, (1, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    got = im2col_conv(x, k, b, (1, 2, 2), [(1, 1)] * 3)
    np.testing.assert_allclose(_np(got), _np(want), atol=1e-5)

    # gradients agree too
    gw_conv = jax.grad(lambda k: (lax.conv_general_dilated(
        x, k, (1, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))).sum())(k)
    gw_im2col = jax.grad(lambda k: im2col_conv(
        x, k, None, (1, 2, 2), [(1, 1)] * 3).sum())(k)
    np.testing.assert_allclose(_np(gw_im2col), _np(gw_conv), atol=1e-4)


# ---------------------------------------------------------------------------
# TransMIL
# ---------------------------------------------------------------------------

def test_transmil_shapes():
    m = M.TransMIL(n_classes=2, L=24, D=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 24))
    params = m.init(jax.random.PRNGKey(1), x)
    h, attns = m.apply(params, x)
    assert h.shape == (2, 32)
    assert len(attns) == 2


def test_transmil_wrap_padding_square():
    """50 tokens → wrap-pad to 64 (8×8) + cls = 65 internal tokens; output
    must be finite and deterministic."""
    m = M.TransMIL(n_classes=2, L=8, D=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 50, 8))
    params = m.init(jax.random.PRNGKey(1), x)
    h1, _ = m.apply(params, x)
    h2, _ = m.apply(params, x)
    assert np.all(np.isfinite(_np(h1)))
    np.testing.assert_allclose(_np(h1), _np(h2))


def test_nystrom_self_attention_masked_rows_do_not_leak():
    """With a fixed mask, changing the *content* of masked rows must not
    change the output on valid rows (the property the reference lacks,
    SURVEY §5 — its padded rows participate in every softmax)."""
    m = M.NystromSelfAttention(dim=16, heads=2, dim_head=8, num_landmarks=8,
                               residual=True)
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (1, 32, 16))
    mask = jnp.arange(32)[None, :] < 24
    params = m.init(jax.random.PRNGKey(3), x, mask)

    out_a, _ = m.apply(params, x, mask)
    garbage = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16)) * 100
    x_b = x.at[:, 24:].set(garbage)
    out_b, _ = m.apply(params, x_b, mask)
    np.testing.assert_allclose(_np(out_a[0, :24]), _np(out_b[0, :24]),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# CLIP text tower parity vs torch mini
# ---------------------------------------------------------------------------

def test_clip_text_encoder_matches_torch_mini():
    import torch
    import torch.nn as tnn
    from collections import OrderedDict

    torch.manual_seed(0)
    width, heads, layers, vocab, ctx, embed = 32, 4, 2, 64, 12, 16

    class QuickGELU(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn = tnn.MultiheadAttention(width, heads)
            self.ln_1 = tnn.LayerNorm(width)
            self.mlp = tnn.Sequential(OrderedDict([
                ("c_fc", tnn.Linear(width, width * 4)),
                ("gelu", QuickGELU()),
                ("c_proj", tnn.Linear(width * 4, width))]))
            self.ln_2 = tnn.LayerNorm(width)

        def forward(self, x, mask):
            x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                              need_weights=False, attn_mask=mask)[0]
            return x + self.mlp(self.ln_2(x))

    tok_emb = tnn.Embedding(vocab, width)
    pos_emb = tnn.Parameter(torch.randn(ctx, width) * 0.01)
    blocks = [Block() for _ in range(layers)]
    ln_final = tnn.LayerNorm(width)
    text_proj = tnn.Parameter(torch.randn(width, embed) * width ** -0.5)

    tokens = torch.randint(1, vocab - 1, (3, ctx))
    tokens[:, -1] = vocab - 1          # EOT = max id
    causal = torch.full((ctx, ctx), float("-inf")).triu_(1)
    with torch.no_grad():
        x = tok_emb(tokens) + pos_emb
        x = x.permute(1, 0, 2)
        for b in blocks:
            x = b(x, causal)
        x = x.permute(1, 0, 2)
        x = ln_final(x)
        want = (x[torch.arange(3), tokens.argmax(-1)] @ text_proj).numpy()

    # export to a CLIP-style state dict and convert
    sd = {"token_embedding.weight": tok_emb.weight,
          "positional_embedding": pos_emb,
          "ln_final.weight": ln_final.weight, "ln_final.bias": ln_final.bias,
          "text_projection": text_proj}
    for i, b in enumerate(blocks):
        pre = f"transformer.resblocks.{i}."
        sd[pre + "attn.in_proj_weight"] = b.attn.in_proj_weight
        sd[pre + "attn.in_proj_bias"] = b.attn.in_proj_bias
        sd[pre + "attn.out_proj.weight"] = b.attn.out_proj.weight
        sd[pre + "attn.out_proj.bias"] = b.attn.out_proj.bias
        sd[pre + "ln_1.weight"] = b.ln_1.weight
        sd[pre + "ln_1.bias"] = b.ln_1.bias
        sd[pre + "ln_2.weight"] = b.ln_2.weight
        sd[pre + "ln_2.bias"] = b.ln_2.bias
        sd[pre + "mlp.c_fc.weight"] = b.mlp.c_fc.weight
        sd[pre + "mlp.c_fc.bias"] = b.mlp.c_fc.bias
        sd[pre + "mlp.c_proj.weight"] = b.mlp.c_proj.weight
        sd[pre + "mlp.c_proj.bias"] = b.mlp.c_proj.bias

    from llmmil_tpu.models.clip_text import (CLIPTextConfig,
                                             convert_torch_clip_state_dict)
    cfg = CLIPTextConfig(vocab_size=vocab, context_length=ctx, width=width,
                         heads=heads, layers=layers, embed_dim=embed)
    params = convert_torch_clip_state_dict(sd, cfg)
    enc = M.CLIPTextEncoder(cfg)
    got = enc.apply({"params": params}, jnp.array(tokens.numpy()))
    np.testing.assert_allclose(_np(got), want, atol=2e-4)


def test_coop_encoder_shapes_and_grad_isolation():
    from llmmil_tpu.models.clip_text import CLIPTextConfig
    cfg = CLIPTextConfig(vocab_size=64, context_length=12, width=16,
                         heads=2, layers=1, embed_dim=8)
    enc = M.CoOpClinicalEncoder(n_prompts=3, n_ctx=4, learnable=True, cfg=cfg)
    tokens = jnp.full((2, 3, 12), 5, dtype=jnp.int32).at[:, :, -1].set(63)
    params = enc.init(jax.random.PRNGKey(0), tokens)
    out = enc.apply(params, tokens)
    assert out.shape == (2, 3, 8)

    # gradient flows into ctx but NOT the token embedding (stop_gradient)
    def loss(p):
        return jnp.sum(enc.apply(p, tokens) ** 2)

    g = jax.grad(loss)(params)
    ctx_g = np.abs(_np(g["params"]["ctx"])).sum()
    emb_g = np.abs(_np(
        g["params"]["clip"]["token_embedding"]["embedding"])).sum()
    assert ctx_g > 0
    # pos-emb/proj do get grads in CoOp; only the lookup is stopped
    assert emb_g == 0


# ---------------------------------------------------------------------------
# simpleFCs
# ---------------------------------------------------------------------------

def test_simple_fcs_shapes():
    rng = jax.random.PRNGKey(0)
    for mod, in_dim in ((M.SimpleFCsV1(9), 9), (M.SimpleFCsV1d(9), 9 * 57),
                        (M.SimpleFCsV2(), 27), (M.SimpleFCsV2d(), 27 * 19)):
        x = jnp.ones((2, in_dim))
        params = mod.init(rng, x)
        assert mod.apply(params, x).shape == (2, 512)


# ---------------------------------------------------------------------------
# ct_layers (debug/dryrun trunk-depth knob)
# ---------------------------------------------------------------------------

def test_ct_layers_knob_reduces_trunk():
    """Config.ct_layers trims blocks per MC3 stage (dryrun graph-size knob);
    [] keeps the torchvision mc3_18 layout (2 blocks/stage)."""
    from llmmil_tpu.models.aggregator import make_ct_extractor

    x = jnp.ones((1, 4, 16, 16, 1))
    base = dict(model_CT="resnetMC3_18", spacing=[2.0, 2.0, 2.5],
                ct_remat="none")

    small = make_ct_extractor(Config(**base, ct_layers=[1, 1, 1, 1]),
                              jnp.float32)
    v = small.init(jax.random.PRNGKey(0), x, train=False)
    trunk = v["params"]["trunk"]
    assert "layer1_0" in trunk and "layer1_1" not in trunk
    assert small.apply(v, x, train=False).shape[-1] == 512

    full = make_ct_extractor(Config(**base), jnp.float32)
    vf = jax.eval_shape(lambda r: full.init(r, x, train=False),
                        jax.random.PRNGKey(0))
    assert "layer1_1" in vf["params"]["trunk"]     # default layout intact


def test_ct_layers_rejected_for_non_mc3_trunks():
    """ct_layers only shapes the MC3 stages; every other trunk rejects it
    loudly instead of silently ignoring it (ADVICE r3)."""
    from llmmil_tpu.models.aggregator import make_ct_extractor
    import pytest

    for model_ct in ("medicalNet", "resnet2plus1d_18", "SwinUNETR",
                     "MViT"):
        with pytest.raises(ValueError, match="ct_layers"):
            make_ct_extractor(Config(model_CT=model_ct,
                                     ct_layers=[1, 1, 1, 1]), jnp.float32)
