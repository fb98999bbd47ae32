"""Offline de-risking of the real-checkpoint weight ports (VERDICT r2 #5).

The actual torchvision ``mc3_18(weights='DEFAULT')`` and OpenAI ViT-B/32
checkpoints cannot be fetched here (zero egress), so these tests pin the
converters against HARD-CODED manifests of the real checkpoints' documented
state-dict key names and shapes (both are stable public API: torchvision
``video.resnet.VideoResNet`` naming, OpenAI ``clip/model.py`` naming).  A
key-name or layout drift in ``convert_mc3_state_dict`` /
``convert_torch_clip_state_dict`` that the schema-identical torch-clone
parity tests (tests/test_torch_import.py) could not see — because the clones
share the converter author's assumptions — fails here instead.

Each test asserts BOTH directions:
- every manifest key is consumed by the converter (minus the documented
  never-used keys: the classifier head, BN ``num_batches_tracked``, and
  CLIP's ``logit_scale``/vision tower);
- the emitted tree has exactly the flax module's param/batch-stats
  structure and leaf shapes (via ``jax.eval_shape`` — no real compute).
"""

import numpy as np
import jax
import jax.numpy as jnp

from llmmil_tpu.models import VideoResNetFeatures
from llmmil_tpu.models.ct_mc3 import ResnetMC3_18
from llmmil_tpu.models.clip_text import (CLIPTextConfig, CLIPTextEncoder,
                                         convert_torch_clip_state_dict)
from llmmil_tpu.models.torch_import import (convert_mc3_state_dict,
                                            convert_resnet_mc3_18)


class RecordingDict(dict):
    """State-dict stand-in that records which keys the converter reads."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _bn_keys(prefix, c):
    return {prefix + "weight": (c,), prefix + "bias": (c,),
            prefix + "running_mean": (c,), prefix + "running_var": (c,),
            prefix + "num_batches_tracked": ()}


def mc3_18_manifest():
    """The EXACT key/shape table of ``torchvision.models.video.mc3_18()``
    .state_dict() (torchvision VideoResNet: BasicStem, Conv3DSimple layer1,
    Conv3DNoTemporal layers 2-4, Kinetics-400 head)."""
    m = {"stem.0.weight": (64, 3, 3, 7, 7)}
    m.update(_bn_keys("stem.1.", 64))
    chans = (64, 128, 256, 512)
    inp = 64
    for i, c in enumerate(chans):
        kdhw = (3, 3, 3) if i == 0 else (1, 3, 3)  # MC3: 3-D only in layer1
        for b in range(2):
            pre = f"layer{i + 1}.{b}."
            cin = inp if b == 0 else c
            m[pre + "conv1.0.weight"] = (c, cin, *kdhw)
            m.update(_bn_keys(pre + "conv1.1.", c))
            m[pre + "conv2.0.weight"] = (c, c, *kdhw)
            m.update(_bn_keys(pre + "conv2.1.", c))
            if b == 0 and i > 0:
                m[pre + "downsample.0.weight"] = (c, cin, 1, 1, 1)
                m.update(_bn_keys(pre + "downsample.1.", c))
        inp = c
    m["fc.weight"] = (400, 512)
    m["fc.bias"] = (400,)
    return m


def _zeros_sd(manifest):
    return RecordingDict({k: np.zeros(s, np.float32)
                          for k, s in manifest.items()})


def _shape_tree(tree):
    return sorted((jax.tree_util.keystr(p), tuple(l.shape)) for p, l in
                  jax.tree_util.tree_leaves_with_path(tree))


def test_mc3_manifest_consumed_and_tree_exact():
    manifest = mc3_18_manifest()
    assert len(manifest) == 122  # 6 stem + 24 layer1 + 3*30 layers2-4 + 2 fc
    sd = _zeros_sd(manifest)
    params, stats = convert_mc3_state_dict(sd)

    unused = {k for k in manifest
              if k.startswith("fc.") or k.endswith("num_batches_tracked")}
    missed = set(manifest) - sd.read - unused
    assert not missed, f"manifest keys never consumed: {sorted(missed)}"
    extra = sd.read - set(manifest)
    assert not extra, f"converter read non-manifest keys: {sorted(extra)}"

    model = VideoResNetFeatures(remat=False, temporal_mode="dfold")
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 4, 32, 32, 3), jnp.float32))
    assert _shape_tree(params) == _shape_tree(shapes["params"])
    assert _shape_tree(stats) == _shape_tree(shapes["batch_stats"])


def test_full_resnet_mc3_18_tree_exact():
    """Trunk + the reference's 1→3ch downsampling stem (resnetMC3.py:10-14)
    must reproduce ResnetMC3_18's full variable tree."""
    sd = _zeros_sd(mc3_18_manifest())
    # spacing 0.6869 → Conv3d(1, 3, (3,4,4), (1,2,2), 1) (resnetMC3.py:11)
    sd_down = RecordingDict({"weight": np.zeros((3, 1, 3, 4, 4), np.float32),
                             "bias": np.zeros((3,), np.float32)})
    params, stats = convert_resnet_mc3_18(sd, sd_down)
    assert sd_down.read == {"weight", "bias"}

    model = ResnetMC3_18(spacing_xy=0.6869, remat=False,
                         temporal_mode="dfold")
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 4, 32, 32, 1), jnp.float32))
    assert _shape_tree(params) == _shape_tree(shapes["params"])
    assert _shape_tree(stats) == _shape_tree(shapes["batch_stats"])


def clip_vitb32_text_manifest():
    """Text-side key/shape table of the OpenAI ViT-B/32 checkpoint
    (clip/model.py: 12-layer width-512 transformer, 49408 vocab, context
    77, embed 512; ``attn`` is torch MultiheadAttention with the packed
    ``in_proj_weight``)."""
    m = {"positional_embedding": (77, 512),
         "text_projection": (512, 512),
         "logit_scale": (),
         "token_embedding.weight": (49408, 512),
         "ln_final.weight": (512,),
         "ln_final.bias": (512,)}
    for i in range(12):
        pre = f"transformer.resblocks.{i}."
        m.update({pre + "attn.in_proj_weight": (1536, 512),
                  pre + "attn.in_proj_bias": (1536,),
                  pre + "attn.out_proj.weight": (512, 512),
                  pre + "attn.out_proj.bias": (512,),
                  pre + "ln_1.weight": (512,), pre + "ln_1.bias": (512,),
                  pre + "mlp.c_fc.weight": (2048, 512),
                  pre + "mlp.c_fc.bias": (2048,),
                  pre + "mlp.c_proj.weight": (512, 2048),
                  pre + "mlp.c_proj.bias": (512,),
                  pre + "ln_2.weight": (512,), pre + "ln_2.bias": (512,)})
    return m


def test_clip_text_manifest_consumed_and_tree_exact():
    manifest = clip_vitb32_text_manifest()
    assert len(manifest) == 6 + 12 * 12
    sd = _zeros_sd(manifest)
    params = convert_torch_clip_state_dict(sd)

    unused = {"logit_scale"}  # the contrastive temperature, not encoder state
    missed = set(manifest) - sd.read - unused
    assert not missed, f"manifest keys never consumed: {sorted(missed)}"
    assert not (sd.read - set(manifest))

    model = CLIPTextEncoder(CLIPTextConfig())
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 77), jnp.int32))
    assert _shape_tree(params) == _shape_tree(shapes["params"])

    # layout spot-checks the shape comparison can't see (square matrices):
    # torch Linear stores (out, in); flax Dense kernels are (in, out)
    sd2 = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    w = np.arange(1536 * 512, dtype=np.float32).reshape(1536, 512)
    sd2["transformer.resblocks.0.attn.in_proj_weight"] = w
    p2 = convert_torch_clip_state_dict(sd2)
    np.testing.assert_array_equal(
        p2["resblock_0"]["attn"]["in_proj"]["kernel"], w.T)


def clip_vitb32_vision_manifest():
    """Vision-side key/shape table of the OpenAI ViT-B/32 checkpoint
    (clip/model.py:202-236: patch 32, width 768, 12 layers, grid 7,
    50-token positional table, 512-d projection)."""
    m = {"visual.class_embedding": (768,),
         "visual.positional_embedding": (50, 768),
         "visual.proj": (768, 512),
         "visual.conv1.weight": (768, 3, 32, 32),
         "visual.ln_pre.weight": (768,), "visual.ln_pre.bias": (768,),
         "visual.ln_post.weight": (768,), "visual.ln_post.bias": (768,)}
    for i in range(12):
        pre = f"visual.transformer.resblocks.{i}."
        m.update({pre + "attn.in_proj_weight": (2304, 768),
                  pre + "attn.in_proj_bias": (2304,),
                  pre + "attn.out_proj.weight": (768, 768),
                  pre + "attn.out_proj.bias": (768,),
                  pre + "ln_1.weight": (768,), pre + "ln_1.bias": (768,),
                  pre + "mlp.c_fc.weight": (3072, 768),
                  pre + "mlp.c_fc.bias": (3072,),
                  pre + "mlp.c_proj.weight": (768, 3072),
                  pre + "mlp.c_proj.bias": (768,),
                  pre + "ln_2.weight": (768,), pre + "ln_2.bias": (768,)})
    return m


def test_clip_vision_manifest_consumed_and_tree_exact():
    from llmmil_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionTransformer, infer_clip_arch,
        convert_torch_clip_vision_state_dict)

    manifest = clip_vitb32_vision_manifest()
    assert len(manifest) == 8 + 12 * 12
    # arch inference works off the combined checkpoint's key space
    vis_cfg, txt_cfg = infer_clip_arch(
        {**manifest, **clip_vitb32_text_manifest()})
    assert vis_cfg == CLIPVisionConfig()
    assert txt_cfg == CLIPTextConfig()

    sd = _zeros_sd(manifest)
    params = convert_torch_clip_vision_state_dict(sd, vis_cfg)
    missed = set(manifest) - sd.read
    assert not missed, f"manifest keys never consumed: {sorted(missed)}"
    assert not (sd.read - set(manifest))

    model = CLIPVisionTransformer(vis_cfg)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert _shape_tree(params) == _shape_tree(shapes["params"])

    # conv layout: torch OIHW → flax HWIO
    sd2 = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    w = np.arange(768 * 3 * 32 * 32, dtype=np.float32) \
        .reshape(768, 3, 32, 32)
    sd2["visual.conv1.weight"] = w
    p2 = convert_torch_clip_vision_state_dict(sd2, vis_cfg)
    np.testing.assert_array_equal(p2["conv1"]["kernel"],
                                  w.transpose(2, 3, 1, 0))
