"""Reference-checkpoint migration tests (models/migrate.py).

Torch minis here re-create the reference modules' EXACT attribute naming and
forward math from their public structure (model/aggregator.py,
model/sam/transformer.py, model/dim1/TransMIL.py + the lucidrains
nystrom_attention package) — freshly written, never copied — so a state
dict saved from them is schema-identical to one the reference's training
loop would save.  Conversion is then checked numerically (flax forward with
converted weights == torch forward) and structurally (a full tri-modal
synthetic checkpoint maps onto the flax tree with only the documented dead
keys dropped).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional

from llmmil_tpu.config import Config
from llmmil_tpu.models.aggregator import Aggregator, build_model
from llmmil_tpu.models.migrate import (convert_flagship_state_dict,
                                       convert_transmil, convert_twoway,
                                       merge_reference_checkpoint, _Taker)
from llmmil_tpu.models.transmil import TransMIL
from llmmil_tpu.models.twoway import TwoWayTransformer
from llmmil_tpu.ops.positional import sinusoidal_pe

from test_weight_manifests import clip_vitb32_text_manifest, mc3_18_manifest


# ---------------------------------------------------------------------------
# Torch minis with reference-exact attribute naming
# ---------------------------------------------------------------------------

class RefAttention(tnn.Module):
    """sam/transformer.py:395-449."""

    def __init__(self, dim, heads, downsample_rate=1):
        super().__init__()
        inner = dim // downsample_rate
        self.heads = heads
        self.q_proj = tnn.Linear(dim, inner)
        self.k_proj = tnn.Linear(dim, inner)
        self.v_proj = tnn.Linear(dim, inner)
        self.out_proj = tnn.Linear(inner, dim)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)

        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.heads, c // self.heads).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        attn = torch.softmax(
            q @ k.transpose(-1, -2) / math.sqrt(q.shape[-1]), dim=-1)
        out = (attn @ v).transpose(1, 2)
        b, n, h, dh = out.shape
        return self.out_proj(out.reshape(b, n, h * dh))


class RefMLPBlock(tnn.Module):
    def __init__(self, dim, mlp_dim):
        super().__init__()
        self.lin1 = tnn.Linear(dim, mlp_dim)
        self.lin2 = tnn.Linear(mlp_dim, dim)

    def forward(self, x):
        return self.lin2(F.relu(self.lin1(x)))


class RefTwoWayBlock(tnn.Module):
    """sam/transformer.py:236-309."""

    def __init__(self, dim, heads, mlp_dim, downsample=2, skip_first=False):
        super().__init__()
        self.self_attn = RefAttention(dim, heads)
        self.norm1 = tnn.LayerNorm(dim)
        self.cross_attn_token_to_image = RefAttention(dim, heads, downsample)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = RefMLPBlock(dim, mlp_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.norm4 = tnn.LayerNorm(dim)
        self.cross_attn_image_to_token = RefAttention(dim, heads, downsample)
        self.skip_first_layer_pe = skip_first

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(queries + self.mlp(queries))
        q = queries + query_pe
        k = keys + key_pe
        keys = self.norm4(keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class RefTwoWay(tnn.Module):
    """sam/transformer.py:10-120."""

    def __init__(self, depth=2, dim=512, heads=8, mlp_dim=2048):
        super().__init__()
        self.layers = tnn.ModuleList(
            [RefTwoWayBlock(dim, heads, mlp_dim, skip_first=(i == 0))
             for i in range(depth)])
        self.final_attn_token_to_image = RefAttention(dim, heads, 2)
        self.norm_final_attn = tnn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        queries, keys = point_embedding, image_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        queries = self.norm_final_attn(
            queries + self.final_attn_token_to_image(q, k, keys))
        return queries, keys


def _torch_pinv(a, iters=6):
    abs_a = torch.abs(a)
    col = abs_a.sum(dim=-2).max(dim=-1).values
    row = abs_a.sum(dim=-1).max(dim=-1).values
    z = a.transpose(-1, -2) / (col * row)[..., None, None]
    eye = torch.eye(a.shape[-1], dtype=a.dtype)
    for _ in range(iters):
        az = a @ z
        z = 0.25 * z @ (13.0 * eye - az @ (15.0 * eye - az @ (7.0 * eye - az)))
    return z


class RefNystromAttention(tnn.Module):
    """lucidrains nystrom_attention naming (TransMIL.py:13-21 config)."""

    def __init__(self, dim, dim_head, heads, num_landmarks,
                 pinv_iterations=6, residual=True,
                 residual_conv_kernel=33, dropout=0.1):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head, self.m = heads, dim_head, num_landmarks
        self.iters = pinv_iterations
        self.to_qkv = tnn.Linear(dim, inner * 3, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, dim),
                                     tnn.Dropout(dropout))
        if residual:
            k = residual_conv_kernel
            self.res_conv = tnn.Conv2d(heads, heads, (k, 1),
                                       padding=(k // 2, 0), groups=heads,
                                       bias=False)

    def forward(self, x):
        b, n, _ = x.shape
        h, dh, m = self.heads, self.dim_head, self.m
        pad = (m - n % m) % m
        x = F.pad(x, (0, 0, pad, 0))
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)

        def split(t):
            return t.reshape(b, -1, h, dh).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        q = q * dh ** -0.5
        seg = q.shape[2] // m
        q_l = q.reshape(b, h, m, seg, dh).mean(dim=3)
        k_l = k.reshape(b, h, m, seg, dh).mean(dim=3)
        attn1 = torch.softmax(q @ k_l.transpose(-1, -2), dim=-1)
        attn2 = torch.softmax(q_l @ k_l.transpose(-1, -2), dim=-1)
        attn3 = torch.softmax(q_l @ k.transpose(-1, -2), dim=-1)
        out = (attn1 @ _torch_pinv(attn2, self.iters)) @ (attn3 @ v)
        out = out + self.res_conv(v)
        out = out.transpose(1, 2).reshape(b, -1, h * dh)
        return self.to_out(out)[:, -n:]


class RefTransLayer(tnn.Module):
    def __init__(self, dim=512):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)
        self.attn = RefNystromAttention(dim, dim // 8, 8, dim // 2)

    def forward(self, x):
        return x + self.attn(self.norm(x))


class RefPPEG(tnn.Module):
    def __init__(self, dim=512):
        super().__init__()
        self.proj = tnn.Conv2d(dim, dim, 7, 1, 7 // 2, groups=dim)
        self.proj1 = tnn.Conv2d(dim, dim, 5, 1, 5 // 2, groups=dim)
        self.proj2 = tnn.Conv2d(dim, dim, 3, 1, 3 // 2, groups=dim)

    def forward(self, x, H, W):
        B, _, C = x.shape
        cls_token, feat = x[:, 0], x[:, 1:]
        f = feat.transpose(1, 2).view(B, C, H, W)
        x = self.proj(f) + f + self.proj1(f) + self.proj2(f)
        x = x.flatten(2).transpose(1, 2)
        return torch.cat((cls_token.unsqueeze(1), x), dim=1)


class RefTransMIL(tnn.Module):
    """dim1/TransMIL.py:48-107 (incl. the dead `_fc2` head)."""

    def __init__(self, n_classes=2, L=512, D=512):
        super().__init__()
        self.pos_layer = RefPPEG(D)
        self._fc1 = tnn.Sequential(tnn.Linear(L, D), tnn.ReLU())
        self.cls_token = tnn.Parameter(torch.randn(1, 1, D))
        self.layer1 = RefTransLayer(D)
        self.layer2 = RefTransLayer(D)
        self.norm = tnn.LayerNorm(D)
        self._fc2 = tnn.Linear(D, n_classes)

    def forward(self, x):
        h = self._fc1(x)
        H = h.shape[1]
        side = int(np.ceil(np.sqrt(H)))
        add = side * side - H
        h = torch.cat([h, h[:, :add]], dim=1)
        cls = self.cls_token.expand(h.shape[0], -1, -1)
        h = torch.cat((cls, h), dim=1)
        h = self.layer1(h)
        h = self.pos_layer(h, side, side)
        h = self.layer2(h)
        return self.norm(h)[:, 0]


class RefABMIL(tnn.Module):
    def __init__(self, L=512, D=192, K=1):
        super().__init__()
        self.attention_V = tnn.Sequential(tnn.Linear(L, D), tnn.Tanh())
        self.attention_U = tnn.Sequential(tnn.Linear(L, D), tnn.Sigmoid())
        self.attention_weights = tnn.Linear(D, K)


class RefSimpleFCsV2(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fc = tnn.Sequential(tnn.Linear(27, 27), tnn.ReLU(),
                                 tnn.Linear(27, 512), tnn.ReLU())

    def forward(self, x):
        return self.fc(x)


class RefFlagshipPathology(tnn.Module):
    """model/aggregator.py with modality=['pathology','CI'], including every
    dead module its __init__ creates regardless (lines 44, 48-56, 66-76,
    124)."""

    def __init__(self, num_classes=2):
        super().__init__()
        self.fc_CI2CT = tnn.Sequential(tnn.Linear(512, 512), tnn.Tanh())
        self.fc_pathology = tnn.Sequential(tnn.Linear(768, 512), tnn.Tanh())
        self.extractor_pathology = RefABMIL(512)
        self.TwoWayTransformer_Pth = RefTwoWay()
        self.fc_CI2Pth = tnn.Sequential(tnn.Linear(512, 512), tnn.Tanh())
        self.fc_CI = tnn.Sequential(tnn.Linear(512, 512), tnn.Tanh())
        self.TwoWayTransformer_Both = RefTwoWay()
        self.aggregator = RefTransMIL(num_classes)
        self.prompt_embedding = tnn.Parameter(torch.randn(1, 512))
        self.clinic_extractor = RefSimpleFCsV2()
        self.fc = tnn.Sequential(tnn.Dropout(0.25),
                                 tnn.Linear(512, num_classes))

    def forward(self, bag, ci, pe):
        x_input = self.fc_pathology(bag)
        x_ci = self.clinic_extractor(ci)
        x_pth2ci, x_ci2pth = self.TwoWayTransformer_Pth(
            x_input, pe, self.fc_CI2Pth(x_ci))
        x0 = torch.cat([x_pth2ci, x_ci2pth], dim=1)
        x0 = self.aggregator(x0)
        return torch.sigmoid(self.fc(x0))


# ---------------------------------------------------------------------------
# Numerical parity
# ---------------------------------------------------------------------------

@torch.no_grad()
def test_twoway_converter_matches_torch():
    torch.manual_seed(0)
    ref = RefTwoWay().eval()
    params = convert_twoway(_Taker(ref.state_dict()), "")

    img = torch.randn(2, 11, 512)
    pe = torch.randn(1, 11, 512)
    pt = torch.randn(2, 3, 512)
    tq, tk = ref(img, pe, pt)

    fq, fk = TwoWayTransformer().apply(
        {"params": params}, jnp.asarray(img.numpy()),
        jnp.asarray(pe.numpy()), jnp.asarray(pt.numpy()))
    np.testing.assert_allclose(np.asarray(fq), tq.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fk), tk.numpy(), atol=2e-4)


@torch.no_grad()
def test_transmil_converter_matches_torch():
    torch.manual_seed(1)
    ref = RefTransMIL(L=512).eval()
    t = _Taker(ref.state_dict())
    params = convert_transmil(t, "")
    assert sorted(t.left) == ["_fc2.bias", "_fc2.weight"]  # the dead head

    x = torch.randn(2, 21, 512)
    want = ref(x).numpy()
    got, _ = TransMIL(n_classes=2, L=512).apply(
        {"params": params}, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


@torch.no_grad()
def test_flagship_pathology_checkpoint_ports_exactly():
    torch.manual_seed(2)
    ref = RefFlagshipPathology().eval()
    sd = ref.state_dict()

    cfg = Config(modality=["pathology"], model_CI="simpleFCs_v2",
                 aggregator="TransMIL", num_classes=2,
                 compute_dtype="float32")
    model = build_model(cfg)
    assert isinstance(model, Aggregator)

    bag = torch.randn(2, 17, 768)
    ci = torch.randn(2, 1, 27)
    batch = {"input_pathology": jnp.asarray(bag.numpy()),
             "input_CI": jnp.asarray(ci[:, 0].numpy())}
    variables = model.init(jax.random.PRNGKey(0), batch)

    merged, report = merge_reference_checkpoint(dict(variables), sd, cfg)
    # pathology-only has the single reference head — nothing left fresh
    assert report["fresh"] == []
    dead = {k.split(".")[0] for k in report["dropped"]}
    assert dead == {"fc_CI2CT", "fc_CI", "extractor_pathology",
                    "TwoWayTransformer_Both", "aggregator",
                    "prompt_embedding"}
    assert all("_fc2" in k for k in report["dropped"]
               if k.startswith("aggregator"))

    pe = torch.tensor(np.asarray(
        sinusoidal_pe(bag.shape[1], 512)))[None].float()
    want = ref(bag, ci, pe).numpy()

    out = model.apply(merged, batch, train=False)
    np.testing.assert_allclose(np.asarray(out["probs"]), want, atol=1e-4)


# ---------------------------------------------------------------------------
# Structural: full tri-modal synthetic checkpoint
# ---------------------------------------------------------------------------

def _lin_keys(pre, din, dout):
    return {pre + "weight": (dout, din), pre + "bias": (dout,)}


def _attn_keys(pre, dim=512, inner=512):
    m = {}
    for n in ("q_proj", "k_proj", "v_proj"):
        m.update(_lin_keys(f"{pre}{n}.", dim, inner))
    m.update(_lin_keys(pre + "out_proj.", inner, dim))
    return m


def _twoway_keys(pre, depth=2, dim=512, mlp=2048):
    m = {}
    for i in range(depth):
        lp = f"{pre}layers.{i}."
        m.update(_attn_keys(lp + "self_attn."))
        m.update(_attn_keys(lp + "cross_attn_token_to_image.", dim, dim // 2))
        m.update(_attn_keys(lp + "cross_attn_image_to_token.", dim, dim // 2))
        m.update(_lin_keys(lp + "mlp.lin1.", dim, mlp))
        m.update(_lin_keys(lp + "mlp.lin2.", mlp, dim))
        for norm in ("norm1", "norm2", "norm3", "norm4"):
            m.update({f"{lp}{norm}.weight": (dim,), f"{lp}{norm}.bias": (dim,)})
    m.update(_attn_keys(pre + "final_attn_token_to_image.", dim, dim // 2))
    m.update({pre + "norm_final_attn.weight": (dim,),
              pre + "norm_final_attn.bias": (dim,)})
    return m


def _transmil_keys(pre, L=512, D=512, n_classes=2):
    m = {}
    m.update(_lin_keys(pre + "_fc1.0.", L, D))
    m[pre + "cls_token"] = (1, 1, D)
    for layer in ("layer1", "layer2"):
        lp = f"{pre}{layer}."
        m.update({lp + "norm.weight": (D,), lp + "norm.bias": (D,),
                  lp + "attn.to_qkv.weight": (3 * D, D),
                  lp + "attn.res_conv.weight": (8, 1, 33, 1)})
        m.update(_lin_keys(lp + "attn.to_out.0.", D, D))
    for proj, k in (("proj", 7), ("proj1", 5), ("proj2", 3)):
        m.update({f"{pre}pos_layer.{proj}.weight": (D, 1, k, k),
                  f"{pre}pos_layer.{proj}.bias": (D,)})
    m.update({pre + "norm.weight": (D,), pre + "norm.bias": (D,)})
    m.update(_lin_keys(pre + "_fc2.", D, n_classes))
    return m


def test_trimodal_checkpoint_structure_maps_exactly():
    cfg = Config(model_CI="CLIP", aggregator="TransMIL",
                 compute_dtype="float32")  # CT + pathology
    n_prompts = cfg.n_clinical + 1

    manifest = {}
    manifest["extractor_CT.downsampling.weight"] = (3, 1, 3, 4, 4)
    manifest["extractor_CT.downsampling.bias"] = (3,)
    for k, s in mc3_18_manifest().items():
        manifest[f"extractor_CT.model.{k}"] = s
    for k, s in clip_vitb32_text_manifest().items():
        manifest[f"clinic_extractor.model.{k}"] = s
    manifest["clinic_extractor.model.visual.conv1.weight"] = (768, 3, 32, 32)
    manifest["clinic_extractor.model.visual.proj"] = (768, 512)
    manifest["clinic_extractor.ctx"] = (n_prompts, cfg.n_ctx, 512)
    for name in ("TwoWayTransformer_CT", "TwoWayTransformer_Pth",
                 "TwoWayTransformer_Both"):
        manifest.update(_twoway_keys(name + "."))
    manifest.update(_lin_keys("fc_CI2CT.0.", 512, 512))
    manifest.update(_lin_keys("fc_CI2Pth.0.", 512, 512))
    manifest.update(_lin_keys("fc_CI.0.", 512, 512))
    manifest.update(_lin_keys("fc_pathology.0.", 768, 512))
    manifest.update(_transmil_keys("extractor_pathology.", L=512))
    manifest.update(_transmil_keys("aggregator."))
    manifest["prompt_embedding"] = (1, 512)
    manifest.update(_lin_keys("fc.1.", 512, cfg.num_classes))

    sd = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    converted, dropped = convert_flagship_state_dict(sd, cfg)
    assert set(dropped) == (
        {k for k in manifest if k.split(".")[0] in
         ("extractor_pathology", "TwoWayTransformer_CT",
          "TwoWayTransformer_Pth", "fc_CI", "prompt_embedding")}
        | {k for k in manifest if "num_batches_tracked" in k
           or k.startswith("clinic_extractor.model.visual.")
           or k == "clinic_extractor.model.logit_scale"
           or k in ("extractor_CT.model.fc.weight",
                    "extractor_CT.model.fc.bias",
                    "aggregator._fc2.weight", "aggregator._fc2.bias")})

    model = build_model(cfg)
    batch = {"input_CT": jnp.zeros((1, 8, 32, 32, 1)),
             "input_pathology": jnp.zeros((1, 12, 768)),
             "input_CI": jnp.zeros((1, n_prompts, 77), jnp.int32)}
    shapes = jax.eval_shape(
        lambda: build_model(cfg).init(jax.random.PRNGKey(0), batch))

    merged, report = merge_reference_checkpoint(dict(shapes), sd, cfg)
    # the reference carries one head; the CT-Pth-Last aux heads start fresh
    assert report["fresh"] == ["params/fc_CT/bias", "params/fc_CT/kernel",
                               "params/fc_Pth/bias", "params/fc_Pth/kernel"]
    # every other leaf was overwritten by checkpoint data
    flat_merged = jax.tree_util.tree_leaves_with_path(merged)
    n_real = sum(isinstance(leaf, np.ndarray) for _, leaf in flat_merged)
    assert n_real == len(flat_merged) - 4


def test_aggregator_tmp_checkpoint_structure_maps_exactly():
    """aggregator_tmp (separate CLIP encoder + TwoWay tower per modality,
    aggregator_tmp.py:120-126) → the separate_CI_encoders flax path."""
    cfg = Config(model_CI="CLIP", aggregator="TransMIL",
                 separate_CI_encoders=1, compute_dtype="float32")
    n_prompts = cfg.n_clinical + 1

    manifest = {}
    manifest["extractor_CT.downsampling.weight"] = (3, 1, 3, 4, 4)
    manifest["extractor_CT.downsampling.bias"] = (3,)
    for k, s in mc3_18_manifest().items():
        manifest[f"extractor_CT.model.{k}"] = s
    for enc in ("clinic_extractor_CT", "clinic_extractor_Pth"):
        for k, s in clip_vitb32_text_manifest().items():
            manifest[f"{enc}.model.{k}"] = s
        manifest[f"{enc}.model.visual.proj"] = (768, 512)
        manifest[f"{enc}.ctx"] = (n_prompts, cfg.n_ctx, 512)
    for name in ("TwoWayTransformer_CT", "TwoWayTransformer_Pth",
                 "TwoWayTransformer_Both"):
        manifest.update(_twoway_keys(name + "."))
    manifest.update(_lin_keys("fc_CI2CT.0.", 512, 512))
    manifest.update(_lin_keys("fc_CI2Pth.0.", 512, 512))
    manifest.update(_lin_keys("fc_CI.0.", 512, 512))
    manifest.update(_lin_keys("fc_pathology.0.", 768, 512))
    manifest.update(_transmil_keys("extractor_pathology.", L=512))
    manifest.update(_transmil_keys("aggregator."))
    manifest["prompt_embedding"] = (1, 512)
    manifest.update(_lin_keys("fc.1.", 512, cfg.num_classes))

    sd = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    converted, dropped = convert_flagship_state_dict(sd, cfg)
    assert {k.split(".")[0] for k in dropped} == {
        "extractor_pathology", "TwoWayTransformer_Both", "fc_CI",
        "prompt_embedding", "clinic_extractor_CT", "clinic_extractor_Pth",
        "extractor_CT", "aggregator"}   # last four: visual/BN-count/fc dead

    batch = {"input_CT": jnp.zeros((1, 8, 32, 32, 1)),
             "input_pathology": jnp.zeros((1, 12, 768)),
             "input_CI": jnp.zeros((1, n_prompts, 77), jnp.int32)}
    shapes = jax.eval_shape(
        lambda: build_model(cfg).init(jax.random.PRNGKey(0), batch))
    merged, report = merge_reference_checkpoint(dict(shapes), sd, cfg)
    assert report["fresh"] == ["params/fc_CT/bias", "params/fc_CT/kernel",
                               "params/fc_Pth/bias", "params/fc_Pth/kernel"]


def test_import_torch_cli_roundtrip(tmp_path):
    """scripts/import_torch.py: torch .pth.tar (DDP 'module.' prefixed) →
    msgpack checkpoint whose params equal the direct conversion."""
    import sys
    sys.path.insert(0, "scripts")
    import import_torch

    torch.manual_seed(3)
    ref = RefFlagshipPathology().eval()
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    pth = tmp_path / "model_best.pth.tar"
    torch.save({"epoch": 7, "state_dict": sd}, pth)
    out = tmp_path / "imported.msgpack"

    import_torch.main([
        "--checkpoint", str(pth), "--out", str(out), "--cpu",
        "--modality", "['pathology']", "--model_CI", "simpleFCs_v2",
        "--aggregator", "TransMIL", "--compute_dtype", "float32"])

    from llmmil_tpu.train.checkpoint import load_checkpoint
    raw = load_checkpoint(str(out))
    cfg = Config(modality=["pathology"], model_CI="simpleFCs_v2",
                 aggregator="TransMIL", compute_dtype="float32")
    want, _ = convert_flagship_state_dict(ref.state_dict(), cfg)

    def flat(tree, pre=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from flat(v, f"{pre}{k}/")
            else:
                yield f"{pre}{k}", v

    got = dict(flat(raw["params"]))
    for path, leaf in flat(want["params"]):
        np.testing.assert_array_equal(got[path], leaf, err_msg=path)


def test_eval_driver_serves_reference_torch_checkpoint(tmp_path):
    """scripts/test.py --test_pth model_best.pth.tar: the eval driver
    converts in-memory and serves; probs match serving the msgpack that
    scripts/import_torch.py wrote from the same file."""
    import sys
    sys.path.insert(0, "scripts")
    import import_torch

    from llmmil_tpu.data import BatchLoader, SyntheticCohort
    from llmmil_tpu.eval import evaluate

    torch.manual_seed(4)
    ref = RefFlagshipPathology().eval()
    pth = tmp_path / "model_best.pth.tar"
    torch.save({"epoch": 2, "state_dict": ref.state_dict()}, pth)

    cfg = Config(modality=["pathology"], model_CI="simpleFCs_v2",
                 CI_input_version="v2", aggregator="TransMIL",
                 compute_dtype="float32", bag_buckets=[64],
                 mode="test", best_thres=0.5, batch_size=1)
    syn = SyntheticCohort(cfg, n_per_hospital=1, seed=5)
    loader = BatchLoader(syn.dataset(cfg, "test"), 1, prefetch=0)

    res_t = evaluate(cfg, loader, checkpoint_path=str(pth),
                     out_dir=str(tmp_path / "t"), mode="test")
    probs_t = res_t["table"]["prob"].to_numpy()
    assert np.all(np.isfinite(probs_t))

    out = tmp_path / "imported.msgpack"
    import_torch.main([
        "--checkpoint", str(pth), "--out", str(out), "--cpu",
        "--modality", "['pathology']", "--model_CI", "simpleFCs_v2",
        "--CI_input_version", "v2", "--aggregator", "TransMIL",
        "--compute_dtype", "float32"])
    res_m = evaluate(cfg, loader, checkpoint_path=str(out),
                     out_dir=str(tmp_path / "m"), mode="test")
    np.testing.assert_allclose(res_m["table"]["prob"].to_numpy(), probs_t,
                               atol=1e-6)


def test_converter_rejects_unknown_keys():
    cfg = Config(modality=["pathology"], model_CI="simpleFCs_v2",
                 aggregator="TransMIL")
    ref = RefFlagshipPathology().eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    sd["surprise.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="schema drift"):
        convert_flagship_state_dict(sd, cfg)


def test_trimodal_r2plus1d_checkpoint_structure_maps_exactly():
    """model_CT='resnet2plus1d_18' flagship checkpoints port end-to-end:
    the torchvision-schema trunk (hand-built torch mini, tests/
    test_torch_import.py) + the usual CLIP/TwoWay/TransMIL surface all
    map; only the CT-Pth-Last aux heads start fresh (VERDICT r4 #4)."""
    import torch
    from test_torch_import import _R2P1Trunk

    cfg = Config(model_CT="resnet2plus1d_18", model_CI="CLIP",
                 aggregator="TransMIL", compute_dtype="float32")
    n_prompts = cfg.n_clinical + 1

    sd = {"extractor_CT.downsampling.weight":
          np.zeros((3, 1, 3, 2, 2), np.float32),
          "extractor_CT.downsampling.bias": np.zeros((3,), np.float32)}
    torch.manual_seed(0)
    for k, v in _R2P1Trunk(layers=(2, 2, 2, 2)).state_dict().items():
        sd[f"extractor_CT.model.{k}"] = v.numpy()

    manifest = {}
    for k, s in clip_vitb32_text_manifest().items():
        manifest[f"clinic_extractor.model.{k}"] = s
    manifest["clinic_extractor.model.visual.conv1.weight"] = (768, 3, 32, 32)
    manifest["clinic_extractor.model.visual.proj"] = (768, 512)
    manifest["clinic_extractor.ctx"] = (n_prompts, cfg.n_ctx, 512)
    for name in ("TwoWayTransformer_CT", "TwoWayTransformer_Pth",
                 "TwoWayTransformer_Both"):
        manifest.update(_twoway_keys(name + "."))
    manifest.update(_lin_keys("fc_CI2CT.0.", 512, 512))
    manifest.update(_lin_keys("fc_CI2Pth.0.", 512, 512))
    manifest.update(_lin_keys("fc_CI.0.", 512, 512))
    manifest.update(_lin_keys("fc_pathology.0.", 768, 512))
    manifest.update(_transmil_keys("extractor_pathology.", L=512))
    manifest.update(_transmil_keys("aggregator."))
    manifest["prompt_embedding"] = (1, 512)
    manifest.update(_lin_keys("fc.1.", 512, cfg.num_classes))
    sd.update({k: np.zeros(s, np.float32) for k, s in manifest.items()})

    converted, dropped = convert_flagship_state_dict(sd, cfg)
    assert not any(k.startswith("extractor_CT.model.layer")
                   and "num_batches" not in k for k in dropped)

    batch = {"input_CT": jnp.zeros((1, 8, 32, 32, 1)),
             "input_pathology": jnp.zeros((1, 12, 768)),
             "input_CI": jnp.zeros((1, n_prompts, 77), jnp.int32)}
    shapes = jax.eval_shape(
        lambda: build_model(cfg).init(jax.random.PRNGKey(0), batch))
    merged, report = merge_reference_checkpoint(dict(shapes), sd, cfg)
    assert report["fresh"] == ["params/fc_CT/bias", "params/fc_CT/kernel",
                               "params/fc_Pth/bias", "params/fc_Pth/kernel"]
