"""Reference-checkpoint migration: torch ``aggregator`` state_dict → flax.

Parity target: the checkpoints the reference's training loop writes —
``torch.save({'state_dict': model.state_dict(), ...})`` of
``model/aggregator.py``'s ``aggregator`` (utils.py save_checkpoint,
loaded back by test_ddp.py:118-127).  A reference user's *trained* model
ports into this framework with exact numerics: every live parameter maps
onto the flax tree (Linear → Dense kernel transpose, Conv → HWIO/DHWIO,
BN → params + batch_stats), and every parameter the reference creates but
never uses in ``forward`` is dropped with a documented reason.

Dead parameters in reference checkpoints (verified against forward()):
- ``prompt_embedding``             created aggregator.py:124, never read
- ``extractor_pathology.*``        created :48-56; forward uses only
                                   ``fc_pathology`` (:141)
- ``TwoWayTransformer_CT/_Pth.*``  created :36-64 but the tri-modal forward
                                   fuses through ``TwoWayTransformer_Both``
                                   (:160-168); in CT-only forward the CT
                                   tower is used and ``_Both`` is dead (:179)
- ``fc_CI2Pth`` / ``fc_CI`` / ``fc_CI2CT``  always created (:44,66,68) but
                                   only the branches of the active modality
                                   set are read (:160-195)
- ``*._fc2.*``                     TransMIL's classification head —
                                   TransMIL.py:62 creates it, forward
                                   returns the cls embedding before it
- ``clinic_extractor.model.visual.*`` / ``.logit_scale``  clip.load loads
                                   the full CLIP; only the text side runs
                                   (dim1/CLIP.py:31-62)
- ``*num_batches_tracked``         torch BN step counters (no flax analog)

The reference checkpoint carries ONE classification head (``fc``); this
framework's tri-modal superset adds ``fc_CT``/``fc_Pth`` when
``loss_point == 'CT-Pth-Last'``.  ``merge_reference_checkpoint`` leaves
those at their fresh initialisation and reports them, so a ported model
reproduces the reference's fused-head logits bit-for-bit while the aux
heads (a training-time auxiliary loss) start fresh.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from ..config import Config
from .clip_text import CLIPTextConfig, convert_torch_clip_state_dict
from .torch_import import (convert_medicalnet_state_dict,
                           convert_mvit_v2_state_dict,
                           convert_r2plus1d_18, convert_resnet_mc3_18)


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, dtype=np.float32)


class _Taker:
    """Pop-based view over a state dict: every consumed key is removed, so
    whatever remains at the end must match a documented dead-key pattern.
    ``bury`` marks keys as deliberately dropped (they land in the dropped
    report rather than being silently consumed)."""

    def __init__(self, sd: Dict):
        self.left = {k: v for k, v in sd.items()}
        self.dead: List[str] = []

    def take(self, key):
        return _np(self.left.pop(key))

    def take_prefix(self, prefix: str) -> Dict:
        sub = {k[len(prefix):]: self.left.pop(k)
               for k in list(self.left) if k.startswith(prefix)}
        if not sub:
            raise KeyError(f"no keys under prefix {prefix!r}")
        return sub

    def bury(self, pred) -> None:
        for k in list(self.left):
            if pred(k):
                self.left.pop(k)
                self.dead.append(k)


def _lin(t: _Taker, pre: str) -> Dict:
    """nn.Linear → Dense {kernel, bias} (weight (out,in) → kernel (in,out))."""
    return {"kernel": t.take(pre + "weight").T, "bias": t.take(pre + "bias")}


def _ln(t: _Taker, pre: str) -> Dict:
    return {"scale": t.take(pre + "weight"), "bias": t.take(pre + "bias")}


def _attention(t: _Taker, pre: str) -> Dict:
    """sam/transformer.py:395-449 Attention → models.twoway.Attention."""
    return {name: _lin(t, f"{pre}{name}.")
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")}


def convert_twoway(t: _Taker, pre: str, depth: int = 2) -> Dict:
    """``TwoWayTransformer`` (sam/transformer.py:10-120) → flax params."""
    params: Dict = {}
    for i in range(depth):
        lp = f"{pre}layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn": _attention(t, lp + "self_attn."),
            "cross_attn_token_to_image":
                _attention(t, lp + "cross_attn_token_to_image."),
            "cross_attn_image_to_token":
                _attention(t, lp + "cross_attn_image_to_token."),
            "mlp": {"lin1": _lin(t, lp + "mlp.lin1."),
                    "lin2": _lin(t, lp + "mlp.lin2.")},
            "norm1": _ln(t, lp + "norm1."), "norm2": _ln(t, lp + "norm2."),
            "norm3": _ln(t, lp + "norm3."), "norm4": _ln(t, lp + "norm4."),
        }
    params["final_attn_token_to_image"] = _attention(
        t, pre + "final_attn_token_to_image.")
    params["norm_final_attn"] = _ln(t, pre + "norm_final_attn.")
    return params


def _ppeg_conv(t: _Taker, pre: str) -> Dict:
    """Depthwise Conv2d (dim, 1, k, k) → flax nn.Conv kernel (k, k, 1, dim)."""
    return {"kernel": np.transpose(t.take(pre + "weight"), (2, 3, 1, 0)),
            "bias": t.take(pre + "bias")}


def convert_transmil(t: _Taker, pre: str) -> Dict:
    """``TransMIL`` (dim1/TransMIL.py:48-107) → models.transmil.TransMIL.

    The nystrom_attention package's parameters (lucidrains naming):
    ``to_qkv`` biasless Linear, ``to_out.0`` Linear, ``res_conv`` depthwise
    Conv2d (heads, 1, k, 1) — the flax ``res_conv`` param keeps that exact
    torch layout (transmil.py:85-89), so it copies through directly.
    """
    params: Dict = {
        "fc1": _lin(t, pre + "_fc1.0."),
        "cls_token": t.take(pre + "cls_token"),
        "norm": _ln(t, pre + "norm."),
        "pos_layer": {"proj": _ppeg_conv(t, pre + "pos_layer.proj."),
                      "proj1": _ppeg_conv(t, pre + "pos_layer.proj1."),
                      "proj2": _ppeg_conv(t, pre + "pos_layer.proj2.")},
    }
    for layer in ("layer1", "layer2"):
        lp = f"{pre}{layer}."
        params[layer] = {
            "norm": _ln(t, lp + "norm."),
            "attn": {
                "to_qkv": {"kernel": t.take(lp + "attn.to_qkv.weight").T},
                "to_out": _lin(t, lp + "attn.to_out.0."),
                "res_conv": t.take(lp + "attn.res_conv.weight"),
            },
        }
    return params


def convert_abmil(t: _Taker, pre: str) -> Dict:
    """``ABMIL`` (dim1/ABMIL.py:6-64) → models.abmil.ABMIL params."""
    return {
        "V_kernel": t.take(pre + "attention_V.0.weight").T,
        "V_bias": t.take(pre + "attention_V.0.bias"),
        "U_kernel": t.take(pre + "attention_U.0.weight").T,
        "U_bias": t.take(pre + "attention_U.0.bias"),
        "w_kernel": t.take(pre + "attention_weights.weight").T,
        "w_bias": t.take(pre + "attention_weights.bias"),
    }


def convert_simple_fcs(t: _Taker, pre: str, variant: str) -> Dict:
    """simpleFCs_v{1,1d,2,2d} → models.simple_fcs params (Sequential index
    naming: Linear layers sit at fc.0 / fc.2)."""
    if variant in ("simpleFCs_v1", "simpleFCs_v2"):
        return {"fc0": _lin(t, pre + "fc.0."), "fc1": _lin(t, pre + "fc.2.")}
    if variant in ("simpleFCs_v1d", "simpleFCs_v2d"):
        return {"fc0": _lin(t, pre + "fc.0.")}
    raise ValueError(f"unknown simpleFCs variant {variant!r}")


def convert_clinic_extractor(t: _Taker, cfg: Config,
                             pre: str = "clinic_extractor.") -> Dict:
    """model_CI dispatch (aggregator.py:108-122)."""
    if cfg.model_CI == "CLIP":
        tcfg = CLIPTextConfig(
            vocab_size=cfg.clip_vocab, context_length=cfg.clip_context,
            width=cfg.clip_width, heads=cfg.clip_heads,
            layers=cfg.clip_layers, embed_dim=cfg.clip_embed)
        # clip.load pulls the FULL model; only the text tower runs
        # (dim1/CLIP.py:31-62) — the vision side and logit_scale are dead.
        t.bury(lambda k: k.startswith(pre + "model.visual.")
               or k == pre + "model.logit_scale")
        text_sd = t.take_prefix(pre + "model.")
        params: Dict = {"clip": convert_torch_clip_state_dict(text_sd, tcfg)}
        if cfg.learnablePrompt:
            params["ctx"] = t.take(pre + "ctx")
        return params
    return convert_simple_fcs(t, pre, cfg.model_CI)


def _convert_ct_extractor(t: _Taker, cfg: Config) -> Tuple[Dict, Dict]:
    """extractor_CT dispatch (aggregator.py:17-34)."""
    pre = "extractor_CT."
    t.bury(lambda k: k.startswith(pre) and
           k.endswith("num_batches_tracked"))
    # torchvision's Kinetics-400 classifier rides along in the wrapped
    # mc3_18 (resnetMC3.py:15) but forward returns the layer4 map (:22-28)
    t.bury(lambda k: k in (pre + "model.fc.weight", pre + "model.fc.bias"))
    if cfg.model_CT == "resnetMC3_18":
        ds = {"weight": t.take(pre + "downsampling.weight"),
              "bias": t.take(pre + "downsampling.bias")}
        return convert_resnet_mc3_18(t.take_prefix(pre + "model."), ds)
    if cfg.model_CT == "medicalNet":
        return convert_medicalnet_state_dict(t.take_prefix(pre))
    if cfg.model_CT == "resnet2plus1d_18":
        ds = {"weight": t.take(pre + "downsampling.weight"),
              "bias": t.take(pre + "downsampling.bias")}
        return convert_r2plus1d_18(t.take_prefix(pre + "model."), ds)
    if cfg.model_CT == "MViT":
        # The wrapper's own TransMIL is dead-on-arrival in the reference:
        # forward feeds 512-d chunk features into TransMIL(L=768)._fc1 —
        # a hard shape error (mvit_v2.py:19,28 + dim1/TransMIL.py:57) —
        # so no trained checkpoint can carry meaningful weights there;
        # the keys are init-time artifacts.  Our L=512 transmil stays at
        # its initialisation (reported 'fresh' by the merge).
        t.bury(lambda k: k.startswith(pre + "TransMIL."))
        h, w = cfg.ct_shape[1], cfg.ct_shape[2]
        grid = ((h + 2 * 3 - 7) // 4 + 1, (w + 2 * 3 - 7) // 4 + 1)
        p, dropped = convert_mvit_v2_state_dict(
            t.take_prefix(pre + "model."), target_grid=grid)
        assert not dropped                  # rel_pos_t buried above
        return {"chunk_mvit": p}, {}
    raise NotImplementedError(
        f"migration for model_CT={cfg.model_CT!r} is not wired: the "
        "reference loads external MONAI/SwinUNETR assets for this trunk "
        "whose schemas are out of scope here; extract features with the "
        "reference and feed them via batch['ct_features'] instead")


# Unconditionally-dead key patterns, per the module docstring.  The
# per-config dead set (the fusion towers / CI projections forward never
# reads for a given modality mix) is computed in convert_flagship_state_dict
# so a live tower the converter failed to consume can never be silently
# classified as dead.
_DEAD_PATTERNS = [
    r"^prompt_embedding$",
    r"^extractor_pathology\.",
    r"\._fc2\.(weight|bias)$",
    r"num_batches_tracked$",
]


def convert_flagship_state_dict(sd: Dict, cfg: Config
                                ) -> Tuple[Dict, List[str]]:
    """Reference ``aggregator`` state_dict → partial flax variables.

    Returns ``({'params': ..., 'batch_stats': ...}, dropped_keys)`` covering
    every parameter the reference *forward* uses for this configuration.
    Raises on keys that are neither mapped nor documented-dead.
    """
    if cfg.model_family != "aggregator":
        raise NotImplementedError(
            "convert_flagship_state_dict handles model/aggregator.py's "
            "`aggregator` (and aggregator_tmp via separate_CI_encoders); "
            "the clip/concat/wMask baselines snapshot different trees")
    has_ct = "CT" in cfg.modality
    has_pth = "pathology" in cfg.modality
    # DDP-wrapped saves carry a 'module.' prefix (train_ddp.py wraps the
    # model in DistributedDataParallel before utils.save_checkpoint)
    if any(k.startswith("module.") for k in sd):
        sd = {(k[7:] if k.startswith("module.") else k): v
              for k, v in sd.items()}
    t = _Taker(sd)
    params: Dict = {}
    stats: Dict = {}

    if cfg.separate_CI_encoders:
        # aggregator_tmp: one CLIP text encoder + TwoWay tower per modality
        # (aggregator_tmp.py:120-126,156-170); only tri-modal + learnable
        # CLIP builds the separate pair there
        if not (has_ct and has_pth and cfg.model_CI == "CLIP"):
            raise NotImplementedError(
                "separate_CI_encoders maps aggregator_tmp's tri-modal "
                "CLIP configuration (aggregator_tmp.py:122-126)")
        params["clinic_extractor_CT"] = convert_clinic_extractor(
            t, cfg, "clinic_extractor_CT.")
        params["clinic_extractor_Pth"] = convert_clinic_extractor(
            t, cfg, "clinic_extractor_Pth.")
    else:
        params["clinic_extractor"] = convert_clinic_extractor(t, cfg)

    if has_ct:
        p, s = _convert_ct_extractor(t, cfg)
        params["extractor_CT"] = p
        stats["extractor_CT"] = s
    if has_pth:
        params["fc_pathology"] = _lin(t, "fc_pathology.0.")

    # Fusion towers + CI projections actually read by forward
    # (aggregator.py:155-195); the rest of the always-created set is dead.
    if has_ct and has_pth and cfg.separate_CI_encoders:
        # aggregator_tmp fuses through the per-modality towers; _Both is dead
        params["TwoWayTransformer_CT"] = convert_twoway(
            t, "TwoWayTransformer_CT.")
        params["TwoWayTransformer_Pth"] = convert_twoway(
            t, "TwoWayTransformer_Pth.")
        params["fc_CI2CT"] = _lin(t, "fc_CI2CT.0.")
        params["fc_CI2Pth"] = _lin(t, "fc_CI2Pth.0.")
    elif has_ct and has_pth:
        params["TwoWayTransformer_Both"] = convert_twoway(
            t, "TwoWayTransformer_Both.")
        params["fc_CI2CT"] = _lin(t, "fc_CI2CT.0.")
        params["fc_CI2Pth"] = _lin(t, "fc_CI2Pth.0.")
    elif has_ct:
        params["TwoWayTransformer_CT"] = convert_twoway(
            t, "TwoWayTransformer_CT.")
        params["fc_CI2CT"] = _lin(t, "fc_CI2CT.0.")
    elif has_pth:
        params["TwoWayTransformer_Pth"] = convert_twoway(
            t, "TwoWayTransformer_Pth.")
        params["fc_CI2Pth"] = _lin(t, "fc_CI2Pth.0.")
    else:
        params["fc_CI"] = _lin(t, "fc_CI.0.")

    if cfg.aggregator == "TransMIL":
        params["aggregator"] = convert_transmil(t, "aggregator.")
    elif cfg.aggregator == "ABMIL":
        params["aggregator"] = convert_abmil(t, "aggregator.")
    elif cfg.aggregator == "ABMIL_v2":
        params["aggregator"] = {"ABMIL_0": convert_abmil(t, "aggregator.")}
    elif cfg.aggregator == "TransMIL_seperate":
        params["aggregator_CT"] = convert_transmil(t, "aggregator_CT.")
        params["aggregator_Pth"] = convert_transmil(t, "aggregator_Pth.")
        params["aggregator"] = convert_abmil(t, "aggregator.")
    elif cfg.aggregator != "-":
        raise NotImplementedError(
            f"migration for aggregator={cfg.aggregator!r} not wired")

    params["fc"] = _lin(t, "fc.1.")          # fc.0 is the Dropout

    # Per-config dead set: whatever the always-created fusion surface
    # (aggregator.py:36-76) leaves unused for this modality mix.
    if has_ct and has_pth:
        dead_live = ([r"^TwoWayTransformer_Both\."] if
                     cfg.separate_CI_encoders else
                     [r"^TwoWayTransformer_(CT|Pth)\."]) + [r"^fc_CI\."]
    elif has_ct:
        dead_live = [r"^TwoWayTransformer_Both\.", r"^fc_CI2Pth\.",
                     r"^fc_CI\."]
    elif has_pth:
        dead_live = [r"^TwoWayTransformer_Both\.", r"^fc_CI2CT\.",
                     r"^fc_CI\."]
    else:
        dead_live = [r"^TwoWayTransformer_Both\.", r"^fc_CI2CT\.",
                     r"^fc_CI2Pth\."]
    patterns = _DEAD_PATTERNS + dead_live

    bad = [k for k in t.left
           if not any(re.search(p, k) for p in patterns)]
    if bad:
        raise ValueError(
            "reference state dict carries keys this converter does not "
            f"recognise (schema drift?): {bad[:8]}")
    dropped = sorted(t.dead) + sorted(t.left)
    return {"params": params, "batch_stats": stats}, dropped


def merge_reference_checkpoint(variables: Dict, sd: Dict, cfg: Config
                               ) -> Tuple[Dict, Dict]:
    """Merge a reference checkpoint into freshly initialised ``variables``.

    Every converted leaf overwrites its flax counterpart (shape-checked);
    leaves the reference has no analog for (e.g. the ``fc_CT``/``fc_Pth``
    aux heads under ``loss_point='CT-Pth-Last'``) keep their init values.
    Returns ``(variables, report)`` with ``report = {'dropped': [...],
    'fresh': [...]}``.
    """
    converted, dropped = convert_flagship_state_dict(sd, cfg)

    def paths(tree, pre=""):
        out = {}
        for k, v in dict(tree).items():
            key = f"{pre}/{k}" if pre else k
            if isinstance(v, dict) or hasattr(v, "items"):
                out.update(paths(v, key))
            else:
                out[key] = v
        return out

    flat_new = paths(converted)
    flat_model = paths(variables)

    def _shape(x):
        return tuple(x.shape) if hasattr(x, "shape") else tuple(np.shape(x))

    merged_flat = {}
    fresh = []
    for path, leaf in flat_model.items():
        if path in flat_new:
            src = flat_new.pop(path)
            if _shape(src) != _shape(leaf):
                raise ValueError(
                    f"shape mismatch at {path}: checkpoint "
                    f"{_shape(src)} vs model {_shape(leaf)}")
            merged_flat[path] = np.asarray(src).astype(leaf.dtype)
        else:
            merged_flat[path] = leaf
            if path.startswith("params/"):
                fresh.append(path)
    if flat_new:
        raise ValueError(
            "converted leaves with no destination in the model tree "
            f"(config mismatch?): {sorted(flat_new)[:8]}")

    out_vars: Dict = {}
    for path, leaf in merged_flat.items():
        parts = path.split("/")
        node = out_vars
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return out_vars, {"dropped": dropped, "fresh": sorted(fresh)}
