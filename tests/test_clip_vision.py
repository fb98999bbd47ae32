"""CLIP vision towers (models/clip_vision.py) vs freshly written torch
minis + state-dict architecture inference parity.

Invariants:
- ViT vision tower matches a torch mini built from torch's own
  MultiheadAttention/Conv2d primitives (independent oracle) after
  converting its CLIP-style state dict;
- ModifiedResNet (anti-aliased bottlenecks + QKV attention pool) matches
  a torch mini using F.multi_head_attention_forward as the pool oracle,
  including randomized BN running stats;
- infer_clip_arch reproduces build_model's (clip/model.py:395-432) shape
  inference for both families from key→shape manifests;
- the dual encoder's contrastive logit matrices are transposes scaled by
  exp(logit_scale).
"""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from llmmil_tpu.models.clip_vision import (
    CLIPVisionConfig, CLIPVisionTransformer, ModifiedResNet, CLIPModel,
    infer_clip_arch, convert_torch_clip_vision_state_dict,
    convert_torch_modified_resnet_state_dict, convert_torch_clip_full)
from llmmil_tpu.models.clip_text import CLIPTextConfig


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# ViT vision tower parity
# ---------------------------------------------------------------------------

def test_clip_vision_vit_matches_torch_mini():
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)
    res, patch, width, heads, layers, embed = 16, 8, 48, 4, 2, 24
    grid = res // patch
    scale = width ** -0.5

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

        def forward(self, x):
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            return x + self.mlp(self.ln_2(x))

    conv1 = tnn.Conv2d(3, width, patch, patch, bias=False)
    cls = tnn.Parameter(scale * torch.randn(width))
    pos = tnn.Parameter(scale * torch.randn(grid ** 2 + 1, width))
    ln_pre, ln_post = tnn.LayerNorm(width), tnn.LayerNorm(width)
    blocks = [Block() for _ in range(layers)]
    proj = tnn.Parameter(scale * torch.randn(width, embed))

    imgs = torch.randn(3, 3, res, res)
    with torch.no_grad():
        x = conv1(imgs).reshape(3, width, -1).permute(0, 2, 1)
        x = torch.cat([cls.expand(3, 1, width), x], dim=1) + pos
        x = ln_pre(x).permute(1, 0, 2)
        for b in blocks:
            x = b(x)
        x = x.permute(1, 0, 2)
        want = (ln_post(x[:, 0]) @ proj).numpy()

    sd = {"visual.conv1.weight": conv1.weight,
          "visual.class_embedding": cls, "visual.positional_embedding": pos,
          "visual.ln_pre.weight": ln_pre.weight,
          "visual.ln_pre.bias": ln_pre.bias,
          "visual.ln_post.weight": ln_post.weight,
          "visual.ln_post.bias": ln_post.bias, "visual.proj": proj}
    for i, b in enumerate(blocks):
        pre = f"visual.transformer.resblocks.{i}."
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

    cfg = CLIPVisionConfig(image_resolution=res, patch_size=patch,
                           width=width, layers=layers, heads=heads,
                           embed_dim=embed)
    params = convert_torch_clip_vision_state_dict(sd, cfg)
    tower = CLIPVisionTransformer(cfg)
    got = tower.apply({"params": params},
                      jnp.array(imgs.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == (3, embed)
    np.testing.assert_allclose(_np(got), want, atol=2e-4)

    # tokens=True also returns the pre-projection sequence
    out, toks = tower.apply({"params": params},
                            jnp.array(imgs.numpy().transpose(0, 2, 3, 1)),
                            tokens=True)
    assert toks.shape == (3, grid ** 2 + 1, width)
    np.testing.assert_allclose(_np(out), want, atol=2e-4)


# ---------------------------------------------------------------------------
# ModifiedResNet parity
# ---------------------------------------------------------------------------

def test_modified_resnet_matches_torch_mini():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    torch.manual_seed(1)
    width, layers, res, embed = 8, (1, 1, 1, 1), 32, 24
    heads = width * 32 // 64      # 4, reference vision_heads rule

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1,
                                    bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.avgpool = (tnn.AvgPool2d(stride) if stride > 1
                            else tnn.Identity())
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = None
            if stride > 1 or inplanes != planes * 4:
                self.downsample = tnn.Sequential(OrderedDict([
                    ("-1", tnn.AvgPool2d(stride) if stride > 1
                     else tnn.Identity()),
                    ("0", tnn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                    ("1", tnn.BatchNorm2d(planes * 4))]))

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.avgpool(out)
            out = self.bn3(self.conv3(out))
            idn = x if self.downsample is None else self.downsample(x)
            return F.relu(out + idn)

    class AttnPool(tnn.Module):
        def __init__(self, spacial, dim, nheads, out_dim):
            super().__init__()
            self.positional_embedding = tnn.Parameter(
                torch.randn(spacial ** 2 + 1, dim) / dim ** 0.5)
            self.q_proj = tnn.Linear(dim, dim)
            self.k_proj = tnn.Linear(dim, dim)
            self.v_proj = tnn.Linear(dim, dim)
            self.c_proj = tnn.Linear(dim, out_dim)
            self.num_heads = nheads

        def forward(self, x):
            x = x.flatten(2).permute(2, 0, 1)
            x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
            x = x + self.positional_embedding[:, None, :]
            x, _ = F.multi_head_attention_forward(
                query=x, key=x, value=x,
                embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
                q_proj_weight=self.q_proj.weight,
                k_proj_weight=self.k_proj.weight,
                v_proj_weight=self.v_proj.weight,
                in_proj_weight=None,
                in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias,
                                        self.v_proj.bias]),
                bias_k=None, bias_v=None, add_zero_attn=False,
                dropout_p=0, out_proj_weight=self.c_proj.weight,
                out_proj_bias=self.c_proj.bias,
                use_separate_proj_weight=True, training=False,
                need_weights=False)
            return x[0]

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, width // 2, 3, 2, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width // 2)
            self.conv2 = tnn.Conv2d(width // 2, width // 2, 3, padding=1,
                                    bias=False)
            self.bn2 = tnn.BatchNorm2d(width // 2)
            self.conv3 = tnn.Conv2d(width // 2, width, 3, padding=1,
                                    bias=False)
            self.bn3 = tnn.BatchNorm2d(width)
            self.avgpool = tnn.AvgPool2d(2)
            inplanes = width
            stages = []
            for s, (planes, blocks) in enumerate(
                    zip((width, width * 2, width * 4, width * 8), layers)):
                blk = [Bottleneck(inplanes, planes, 2 if s > 0 else 1)]
                inplanes = planes * 4
                blk += [Bottleneck(inplanes, planes)
                        for _ in range(blocks - 1)]
                stages.append(tnn.Sequential(*blk))
            self.layer1, self.layer2, self.layer3, self.layer4 = stages
            self.attnpool = AttnPool(res // 32, width * 32, heads, embed)

        def forward(self, x):
            for conv, bn in ((self.conv1, self.bn1), (self.conv2, self.bn2),
                             (self.conv3, self.bn3)):
                x = F.relu(bn(conv(x)))
            x = self.avgpool(x)
            for layer in (self.layer1, self.layer2, self.layer3,
                          self.layer4):
                x = layer(x)
            return self.attnpool(x)

    net = Net().eval()
    # randomize BN running stats so conversion is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    imgs = torch.randn(2, 3, res, res)
    with torch.no_grad():
        want = net(imgs).numpy()

    sd = {"visual." + k: v for k, v in net.state_dict().items()}
    sd["visual.attnpool.positional_embedding"] = \
        net.attnpool.positional_embedding
    cfg = CLIPVisionConfig(image_resolution=res, patch_size=0, width=width,
                           layers=layers, heads=heads, embed_dim=embed)
    variables = convert_torch_modified_resnet_state_dict(sd, cfg)
    tower = ModifiedResNet(cfg)
    got = tower.apply(variables,
                      jnp.array(imgs.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == (2, embed)
    np.testing.assert_allclose(_np(got), want, atol=3e-4)


# ---------------------------------------------------------------------------
# build_model shape inference parity
# ---------------------------------------------------------------------------

def _vit_b32_manifest():
    """Key→shape manifest of the real ViT-B/32 checkpoint's
    architecture-determining keys (OpenAI clip/model.py naming)."""
    m = {"visual.conv1.weight": (768, 3, 32, 32),
         "visual.proj": (768, 512),
         "visual.positional_embedding": (50, 768),
         "text_projection": (512, 512),
         "token_embedding.weight": (49408, 512),
         "positional_embedding": (77, 512),
         "ln_final.weight": (512,)}
    for i in range(12):
        m[f"visual.transformer.resblocks.{i}.attn.in_proj_weight"] = \
            (2304, 768)
        m[f"transformer.resblocks.{i}.attn.in_proj_weight"] = (1536, 512)
    return m


def _rn50_manifest():
    m = {"visual.layer1.0.conv1.weight": (64, 64, 1, 1),
         "visual.attnpool.positional_embedding": (50, 2048),
         "text_projection": (512, 1024),
         "token_embedding.weight": (49408, 512),
         "positional_embedding": (77, 512),
         "ln_final.weight": (512,)}
    for stage, blocks in zip((1, 2, 3, 4), (3, 4, 6, 3)):
        for b in range(blocks):
            m[f"visual.layer{stage}.{b}.conv2.weight"] = (0,)
    for i in range(12):
        m[f"transformer.resblocks.{i}.attn.in_proj_weight"] = (1536, 512)
    return m


def test_infer_clip_arch_vit_b32():
    vis, txt = infer_clip_arch(_vit_b32_manifest())
    assert vis == CLIPVisionConfig(image_resolution=224, patch_size=32,
                                   width=768, layers=12, heads=12,
                                   embed_dim=512)
    assert txt == CLIPTextConfig(vocab_size=49408, context_length=77,
                                 width=512, heads=8, layers=12,
                                 embed_dim=512)


def test_infer_clip_arch_rn50():
    vis, txt = infer_clip_arch(_rn50_manifest())
    assert not vis.is_vit
    assert vis.layers == (3, 4, 6, 3)
    assert vis.width == 64 and vis.heads == 32
    assert vis.image_resolution == 224 and vis.embed_dim == 1024
    assert txt.embed_dim == 1024


# ---------------------------------------------------------------------------
# dual-encoder contrastive logits
# ---------------------------------------------------------------------------

def test_clip_dual_encoder_logits():
    vcfg = CLIPVisionConfig(image_resolution=16, patch_size=8, width=32,
                            layers=1, heads=2, embed_dim=16)
    tcfg = CLIPTextConfig(vocab_size=64, context_length=12, width=16,
                          heads=2, layers=1, embed_dim=16)
    model = CLIPModel(vcfg, tcfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(3, 16, 16, 3),
                       jnp.float32)
    toks = jnp.full((4, 12), 5, jnp.int32).at[:, -1].set(63)
    variables = model.init(jax.random.PRNGKey(0), imgs, toks)
    li, lt = model.apply(variables, imgs, toks)
    assert li.shape == (3, 4) and lt.shape == (4, 3)
    np.testing.assert_allclose(_np(li), _np(lt).T, atol=1e-6)
    # cosine-similarity logits are bounded by the scale
    scale = float(np.exp(variables["params"]["logit_scale"]))
    assert np.all(np.abs(_np(li)) <= scale * 1.001)
