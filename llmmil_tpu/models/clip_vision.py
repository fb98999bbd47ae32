"""CLIP vision towers (ViT + ModifiedResNet) and the dual-encoder shell.

Parity targets: the vendored CLIP vision side the reference loads with
every checkpoint but never exercises (SURVEY.md §2.3) —
``clip/model.py:202-236`` (VisionTransformer: patch conv embed, class
token, pre-LN non-causal blocks, ln_post on the class token, output
projection), ``clip/model.py:10-150`` (ModifiedResNet: 3-conv stem with
avg-pool anti-aliased strides, Bottleneck blocks whose stride is an
avg-pool before conv3, QKV attention pooling instead of global average),
``clip/model.py:239-368`` (the CLIP dual-encoder with contrastive logit
matrices), and the state-dict architecture inference of ``build_model``
(``clip/model.py:395-432``).

TPU notes: images are NHWC; the patch embed is a strided conv that XLA
maps straight onto the MXU (a 224² ViT-B/32 batch is an embarrassingly
matmul-shaped workload — see ``data/wsi.py`` for the tile pipeline that
feeds it).  The attention pool computes the query for the pooled token
ONLY (the reference runs full (HW+1)² attention and throws away every
row but the first, ``clip/model.py:66-90`` — numerics identical).
LayerNorms run in fp32 regardless of compute dtype, mirroring the
reference's fp16-safe LayerNorm (``clip/model.py:153-158``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .clip_text import (CLIPTextConfig, CLIPTextEncoder,
                        ResidualAttentionBlock,
                        convert_torch_clip_state_dict)

__all__ = [
    "CLIPVisionConfig", "CLIPVisionTransformer", "ModifiedResNet",
    "CLIPModel", "infer_clip_arch", "convert_torch_clip_vision_state_dict",
    "convert_torch_modified_resnet_state_dict",
]


@dataclass(frozen=True)
class CLIPVisionConfig:
    """ViT-B/32 vision tower hyperparameters (clip/model.py:395-403).

    ``layers`` is an int for the ViT family and a 4-tuple of stage block
    counts for the ModifiedResNet family — the same overload the
    reference's ``CLIP.__init__`` dispatches on (clip/model.py:258-276).
    """
    image_resolution: int = 224
    patch_size: int = 32              # None/0 for the ResNet family
    width: int = 768                  # ResNet: stem width (64 for RN50)
    layers: Union[int, Tuple[int, int, int, int]] = 12
    heads: int = 12                   # ViT: width//64; RN: width*32//64
    embed_dim: int = 512

    @property
    def is_vit(self) -> bool:
        return not isinstance(self.layers, (tuple, list))

    @property
    def grid(self) -> int:
        return self.image_resolution // self.patch_size


class CLIPVisionTransformer(nn.Module):
    """CLIP VisionTransformer (clip/model.py:202-236), NHWC input.

    ``__call__(images)``: (B, R, R, 3) → (B, embed_dim).  ``tokens=True``
    additionally returns the pre-projection token sequence (B, 1+grid²,
    width) for dense downstream use.
    """
    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, tokens: bool = False):
        c = self.cfg
        b = x.shape[0]
        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = x.reshape(b, -1, c.width)                    # (B, grid², W)
        cls = self.param("class_embedding",
                         nn.initializers.normal(c.width ** -0.5),
                         (c.width,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c.width ** -0.5),
                         (x.shape[1] + 1, c.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.width)), x],
            axis=1)
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(name="ln_pre", dtype=jnp.float32)(x)
        for i in range(c.layers):
            x = ResidualAttentionBlock(c.width, c.heads, self.dtype,
                                       causal=False,
                                       name=f"resblock_{i}")(x)
        pooled = nn.LayerNorm(name="ln_post", dtype=jnp.float32)(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(c.width ** -0.5),
                          (c.width, c.embed_dim))
        out = pooled @ proj.astype(pooled.dtype)
        return (out, x) if tokens else out


class _Bottleneck(nn.Module):
    """CLIP's anti-aliased Bottleneck (clip/model.py:10-53): all convs are
    stride 1; ``stride>1`` is an avg-pool after conv2 (and prepended to the
    1×1 downsample conv)."""
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name=name)

        out = nn.relu(bn("bn1")(nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv1")(x)))
        out = nn.relu(bn("bn2")(nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2")(out)))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride,) * 2, (self.stride,) * 2)
        out = bn("bn3")(nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv3")(out))

        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * self.expansion:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       (self.stride,) * 2)
            identity = bn("downsample_bn")(nn.Conv(
                self.planes * self.expansion, (1, 1), use_bias=False,
                dtype=self.dtype, name="downsample_conv")(identity))
        return nn.relu(out + identity)


class _AttentionPool2d(nn.Module):
    """QKV attention pooling (clip/model.py:56-90).  The torch version
    attends every token to every token and keeps row 0; only the mean
    token's query matters for that row, so we compute q for it alone —
    identical numerics, (HW+1)× less attention work."""
    embed_dim: int
    heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5),
                         (h * w + 1, c))
        x = x + pos.astype(x.dtype)
        dh = self.embed_dim // self.heads
        q = nn.Dense(self.embed_dim, dtype=self.dtype,
                     name="q_proj")(x[:, :1])           # (B, 1, E)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            return jnp.swapaxes(
                t.reshape(b, t.shape[1], self.heads, dh), 1, 2)

        q, k, v = split(q), split(k), split(v)
        attn = jax.nn.softmax(
            (q @ jnp.swapaxes(k, -1, -2))
            / jnp.sqrt(jnp.asarray(dh, q.dtype)), axis=-1)
        out = jnp.swapaxes(attn @ v, 1, 2).reshape(b, self.embed_dim)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name="c_proj")(out)


class ModifiedResNet(nn.Module):
    """CLIP's ModifiedResNet vision tower (clip/model.py:93-150): 3-conv
    stem (first stride 2) + avg-pool, four Bottleneck stages, attention
    pooling to ``embed_dim``.  NHWC input (B, R, R, 3)."""
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        width = c.width

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name=name)

        x = nn.relu(bn("bn1")(nn.Conv(
            width // 2, (3, 3), strides=(2, 2), padding=1, use_bias=False,
            dtype=self.dtype, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(
            width // 2, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(
            width, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for stage, (planes, blocks) in enumerate(
                zip((width, width * 2, width * 4, width * 8), c.layers)):
            for i in range(blocks):
                x = _Bottleneck(planes,
                                stride=(2 if stage > 0 and i == 0 else 1),
                                dtype=self.dtype,
                                name=f"layer{stage + 1}_{i}")(
                    x, train=train)

        return _AttentionPool2d(width * 32, c.heads, c.embed_dim,
                                dtype=self.dtype, name="attnpool")(x)


def make_vision_tower(cfg: CLIPVisionConfig, dtype=jnp.float32,
                      name: str = "visual"):
    """ViT vs ModifiedResNet dispatch on the layers overload
    (clip/model.py:258-276)."""
    if cfg.is_vit:
        return CLIPVisionTransformer(cfg, dtype=dtype, name=name)
    return ModifiedResNet(cfg, dtype=dtype, name=name)


class CLIPModel(nn.Module):
    """The full dual encoder (clip/model.py:239-368): vision tower + text
    tower + learnable ``logit_scale``; ``__call__`` returns the
    contrastive logit matrices over L2-normalized features."""
    vision_cfg: CLIPVisionConfig = CLIPVisionConfig()
    text_cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = make_vision_tower(self.vision_cfg, self.dtype,
                                        name="visual")
        self.text = CLIPTextEncoder(self.text_cfg, self.dtype, name="text")
        self.logit_scale = self.param(
            "logit_scale", lambda *_: jnp.asarray(np.log(1 / 0.07)), ())

    def encode_image(self, images, **kw):
        return self.visual(images, **kw)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# State-dict architecture inference (clip/model.py:395-432 parity).
# ---------------------------------------------------------------------------

def infer_clip_arch(sd) -> Tuple[CLIPVisionConfig, CLIPTextConfig]:
    """Infer both towers' configs from a CLIP state dict (or a key→shape
    manifest) exactly like the reference's ``build_model``."""

    def shape(k):
        v = sd[k]
        return tuple(v if isinstance(v, (tuple, list)) else v.shape)

    vit = "visual.proj" in sd
    if vit:
        vision_width = shape("visual.conv1.weight")[0]
        vision_layers = len([k for k in sd
                             if k.startswith("visual.")
                             and k.endswith(".attn.in_proj_weight")])
        vision_patch = shape("visual.conv1.weight")[-1]
        grid = round((shape("visual.positional_embedding")[0] - 1) ** 0.5)
        vision_cfg = CLIPVisionConfig(
            image_resolution=vision_patch * grid, patch_size=vision_patch,
            width=vision_width, layers=vision_layers,
            heads=vision_width // 64,
            embed_dim=shape("text_projection")[1])
    else:
        counts = tuple(
            len({k.split(".")[2] for k in sd
                 if k.startswith(f"visual.layer{b}")}) for b in (1, 2, 3, 4))
        vision_width = shape("visual.layer1.0.conv1.weight")[0]
        out_width = round(
            (shape("visual.attnpool.positional_embedding")[0] - 1) ** 0.5)
        vision_cfg = CLIPVisionConfig(
            image_resolution=out_width * 32, patch_size=0,
            width=vision_width, layers=counts,
            heads=vision_width * 32 // 64,
            embed_dim=shape("text_projection")[1])

    text_cfg = CLIPTextConfig(
        vocab_size=shape("token_embedding.weight")[0],
        context_length=shape("positional_embedding")[0],
        width=shape("ln_final.weight")[0],
        heads=shape("ln_final.weight")[0] // 64,
        layers=len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks")}),
        embed_dim=shape("text_projection")[1])
    return vision_cfg, text_cfg


# ---------------------------------------------------------------------------
# Weight import (vision side; complements convert_torch_clip_state_dict).
# ---------------------------------------------------------------------------

def _g(sd, key):
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv_hwio(sd, key):
    """Torch OIHW conv weight → flax HWIO."""
    return _g(sd, key).transpose(2, 3, 1, 0)


def _resblock_params(sd, pre):
    return {
        "ln_1": {"scale": _g(sd, pre + "ln_1.weight"),
                 "bias": _g(sd, pre + "ln_1.bias")},
        "ln_2": {"scale": _g(sd, pre + "ln_2.weight"),
                 "bias": _g(sd, pre + "ln_2.bias")},
        "attn": {
            "in_proj": {"kernel": _g(sd, pre + "attn.in_proj_weight").T,
                        "bias": _g(sd, pre + "attn.in_proj_bias")},
            "out_proj": {"kernel": _g(sd, pre + "attn.out_proj.weight").T,
                         "bias": _g(sd, pre + "attn.out_proj.bias")},
        },
        "c_fc": {"kernel": _g(sd, pre + "mlp.c_fc.weight").T,
                 "bias": _g(sd, pre + "mlp.c_fc.bias")},
        "c_proj": {"kernel": _g(sd, pre + "mlp.c_proj.weight").T,
                   "bias": _g(sd, pre + "mlp.c_proj.bias")},
    }


def convert_torch_clip_vision_state_dict(
        sd: dict, cfg: CLIPVisionConfig | None = None) -> dict:
    """OpenAI CLIP state dict (``visual.*`` ViT keys) → flax params for
    :class:`CLIPVisionTransformer`."""
    if cfg is None:
        cfg = infer_clip_arch(sd)[0]
    if not cfg.is_vit:
        return convert_torch_modified_resnet_state_dict(sd, cfg)
    params = {
        "conv1": {"kernel": _conv_hwio(sd, "visual.conv1.weight")},
        "class_embedding": _g(sd, "visual.class_embedding"),
        "positional_embedding": _g(sd, "visual.positional_embedding"),
        "ln_pre": {"scale": _g(sd, "visual.ln_pre.weight"),
                   "bias": _g(sd, "visual.ln_pre.bias")},
        "ln_post": {"scale": _g(sd, "visual.ln_post.weight"),
                    "bias": _g(sd, "visual.ln_post.bias")},
        "proj": _g(sd, "visual.proj"),
    }
    for i in range(cfg.layers):
        params[f"resblock_{i}"] = _resblock_params(
            sd, f"visual.transformer.resblocks.{i}.")
    return params


def _bn_params(sd, pre):
    return ({"scale": _g(sd, pre + "weight"),
             "bias": _g(sd, pre + "bias")},
            {"mean": _g(sd, pre + "running_mean"),
             "var": _g(sd, pre + "running_var")})


def convert_torch_modified_resnet_state_dict(
        sd: dict, cfg: CLIPVisionConfig | None = None) -> dict:
    """OpenAI CLIP RN-family ``visual.*`` keys → flax variables
    ``{"params": ..., "batch_stats": ...}`` for :class:`ModifiedResNet`."""
    if cfg is None:
        cfg = infer_clip_arch(sd)[0]
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = {
            "kernel": _conv_hwio(sd, f"visual.conv{i}.weight")}
        params[f"bn{i}"], stats[f"bn{i}"] = _bn_params(sd, f"visual.bn{i}.")
    for stage, blocks in enumerate(cfg.layers):
        for b in range(blocks):
            pre = f"visual.layer{stage + 1}.{b}."
            name = f"layer{stage + 1}_{b}"
            p: dict = {}
            s: dict = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {
                    "kernel": _conv_hwio(sd, pre + f"conv{i}.weight")}
                p[f"bn{i}"], s[f"bn{i}"] = _bn_params(sd, pre + f"bn{i}.")
            if pre + "downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv_hwio(sd, pre + "downsample.0.weight")}
                p["downsample_bn"], s["downsample_bn"] = _bn_params(
                    sd, pre + "downsample.1.")
            params[name] = p
            stats[name] = s
    ap = "visual.attnpool."
    params["attnpool"] = {
        "positional_embedding": _g(sd, ap + "positional_embedding"),
        **{f"{n}_proj": {"kernel": _g(sd, ap + f"{n}_proj.weight").T,
                         "bias": _g(sd, ap + f"{n}_proj.bias")}
           for n in ("q", "k", "v")},
        "c_proj": {"kernel": _g(sd, ap + "c_proj.weight").T,
                   "bias": _g(sd, ap + "c_proj.bias")},
    }
    return {"params": params, "batch_stats": stats}


def convert_torch_clip_full(sd: dict) -> dict:
    """Full dual-encoder import: ``{"params": {visual, text, logit_scale}}``
    (+ ``batch_stats`` for the RN family) for :class:`CLIPModel`."""
    vision_cfg, text_cfg = infer_clip_arch(sd)
    vis = convert_torch_clip_vision_state_dict(sd, vision_cfg)
    out = {"params": {
        "text": convert_torch_clip_state_dict(sd, text_cfg),
        "logit_scale": _g(sd, "logit_scale"),
    }}
    if vision_cfg.is_vit:
        out["params"]["visual"] = vis
    else:
        out["params"]["visual"] = vis["params"]
        out["batch_stats"] = {"visual": vis["batch_stats"]}
    return out
