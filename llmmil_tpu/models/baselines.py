"""Baseline fusion models.

Parity targets:
- ``model/aggregator_clip.py:79-118`` (AggregatorClip): per-modality
  extractor → per-modality fc → **feature averaging** late fusion →
  sigmoid head; returns per-branch features + prediction.  Selected by the
  alternative factory ``model/utils_clip.py:6-8``.
- ``model/aggregator_previous.py`` (AggregatorConcat): the oldest baseline —
  per-modality features concatenated → fc1 → fc2 → sigmoid.  (The reference
  file has a latent ImportError on its ABMIL path — ``gatedAttention``
  doesn't exist; implemented correctly here.)
- ``model/aggregator_wMask.py:38-114`` (AggregatorWMask): the mask-aware
  concat-fusion model ``get_model`` dispatches to whenever ``'wMask' in
  model_CT`` (model/utils.py:7-9) — CT(image⊕mask) ⊕ gated-attention
  pathology ⊕ simpleFCs CI → Dropout/Linear/ReLU/Dropout/Linear → sigmoid.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..ops.pallas import resolve_use_pallas
from .abmil import ABMIL
from .aggregator import EMBED_DIM, make_ct_extractor, mask_centroids
from .ct_mc3 import ResnetMC3_18


class _CTPooled(nn.Module):
    """CT volume → pooled 512-d vector (mean over layer4 map)."""
    spacing_xy: float = 0.6869
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResnetMC3_18(spacing_xy=self.spacing_xy, dtype=self.dtype,
                            name="trunk")(x, train)
        return feat.mean(axis=(1, 2, 3))


class AggregatorClip(nn.Module):
    """Late-fusion baseline: average per-modality 512-d features."""
    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 return_attn: bool = False):
        c = self.cfg
        feats = {}
        if "CT" in c.modality:
            ct = _CTPooled(c.spacing[0], self.dtype,
                           name="extractor_CT")(batch["input_CT"], train)
            feats["CT"] = jnp.tanh(nn.Dense(EMBED_DIM, dtype=self.dtype,
                                            name="fc_CT")(ct))
        if "pathology" in c.modality:
            tokens = jnp.tanh(nn.Dense(EMBED_DIM, dtype=self.dtype,
                                       name="fc_pathology")(
                batch["input_pathology"]))
            pooled, _ = ABMIL(L=EMBED_DIM, dtype=self.dtype,
                              use_pallas=resolve_use_pallas(
                                  c.use_pallas, raw_bag=True),
                              shard_axis=c.bag_shard_axis or None,
                              name="extractor_pathology")(
                tokens, batch.get("mask_pathology"), train)
            feats["pathology"] = jnp.tanh(nn.Dense(
                EMBED_DIM, dtype=self.dtype, name="fc_Pth")(pooled[:, 0]))
        if "CI" in c.modality or batch.get("input_CI") is not None:
            ci = batch["input_CI"]
            if ci.dtype in (jnp.int32, jnp.int64):   # text tokens
                from .clip_text import CLIPTextConfig, CoOpClinicalEncoder
                tcfg = CLIPTextConfig(
                    vocab_size=c.clip_vocab, context_length=c.clip_context,
                    width=c.clip_width, heads=c.clip_heads,
                    layers=c.clip_layers, embed_dim=c.clip_embed)
                enc = CoOpClinicalEncoder(
                    n_prompts=c.n_clinical + 1, n_ctx=c.n_ctx,
                    learnable=bool(c.learnablePrompt), cfg=tcfg,
                    dtype=self.dtype, name="clinic_extractor")
                x_ci = enc(ci).mean(axis=1)
            else:
                x_ci = nn.relu(nn.Dense(EMBED_DIM, dtype=self.dtype,
                                        name="enc_CI")(ci))
            feats["CI"] = jnp.tanh(nn.Dense(EMBED_DIM, dtype=self.dtype,
                                            name="fc_CI")(x_ci))

        fused = sum(feats.values()) / len(feats)
        logits = nn.Dense(c.num_classes, dtype=self.dtype,
                          name="fc")(fused)
        probs = nn.sigmoid(logits) if c.activationF == "sigmoid" \
            else nn.softmax(logits, axis=-1)
        out = {"probs": probs}
        out.update({f"feat_{k}": v for k, v in feats.items()})
        return out


class AggregatorWMask(nn.Module):
    """Mask-aware concat-fusion model (``model/aggregator_wMask.py:38-114``).

    Per-modality features are concatenated and pushed through a 2-layer
    Dropout(0.25)/Linear/ReLU head to a single sigmoid prediction — no
    TwoWay cross-attention, no per-modality heads.  Branches:

    - CT: ``resnetMC3_18_wMask`` concatenates the tumour mask as a second
      input channel before the trunk (aggregator_wMask.py:79; the reference
      extractor's forward is missing its return statement — fixed here) and
      mean-pools the layer4 map; ``SwinUNETR_wMask`` takes mask-centred
      crops and returns the gated-attention-pooled 768-d crop feature
      (aggregator_wMask.py:77).
    - pathology: gated-attention (ABMIL) pooling of the raw 768-d bag
      (aggregator_wMask.py:23-25 — the reference imports a nonexistent
      ``gatedAttention``; implemented as the standard Ilse gated attention),
      or TransMIL (aggregator_wMask.py:26-28).
    - CI: simpleFCs v1/v2 512-d encoding (aggregator_wMask.py:30-36; the
      reference declares ``len(clinical_features)`` input features for the
      head, which shape-crashes — the head here sizes off the true concat).

    Head widths follow aggregator_wMask.py:38-70: hidden = 192 per
    CT/pathology modality; CI-only collapses to a single Dropout+Linear.
    """
    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 return_attn: bool = False):
        c = self.cfg
        dt = self.dtype
        parts = []
        hidden = 0
        if "CT" in c.modality:
            ct_in = batch["input_CT"]
            if "SwinUNETR" in c.model_CT:
                center = None
                if "mask_CT" in batch:
                    center = mask_centroids(batch["mask_CT"][..., 0])
                feat = make_ct_extractor(c, dt, name="extractor_CT")(
                    ct_in, center=center, train=train)
            else:
                if "mask_CT" in batch:
                    ct_in = jnp.concatenate(
                        [ct_in, batch["mask_CT"].astype(ct_in.dtype)],
                        axis=-1)
                feat = make_ct_extractor(c, dt, name="extractor_CT")(
                    ct_in, train=train)
            if feat.ndim == 5:                      # layer4 map → vector
                feat = feat.mean(axis=(1, 2, 3))
            elif feat.ndim == 3:
                feat = feat.mean(axis=1)
            parts.append(feat)
            hidden += 192
        if "pathology" in c.modality:
            bag = batch["input_pathology"]
            pmask = batch.get("mask_pathology")
            if c.model_pathology == "TransMIL":
                from .transmil import TransMIL
                pooled, _ = TransMIL(n_classes=c.num_classes, L=EMBED_DIM,
                                     dtype=dt, name="extractor_pathology")(
                    bag, mask=pmask, train=train)
            else:                                   # gated attention (ABMIL)
                pooled, _ = ABMIL(L=768, dtype=dt,
                                  use_pallas=resolve_use_pallas(
                                      c.use_pallas, raw_bag=True),
                                  shard_axis=c.bag_shard_axis or None,
                                  name="extractor_pathology")(
                    bag, pmask, train)
                pooled = pooled[:, 0]
            parts.append(pooled)
            hidden += 192
        if "CI" in c.modality:
            from .simple_fcs import SimpleFCsV1, SimpleFCsV2
            enc = (SimpleFCsV2(dt, name="extractor_CI")
                   if c.model_CI == "simpleFCs_v2"
                   else SimpleFCsV1(c.n_clinical, dt, name="extractor_CI"))
            parts.append(enc(batch["input_CI"]))
        x = jnp.concatenate([p.astype(dt) for p in parts], axis=-1)
        drop = nn.Dropout(0.25, deterministic=not train)
        if hidden == 0:                             # CI-only single layer
            logits = nn.Dense(c.num_classes, dtype=dt, name="fc_out")(
                drop(x))
        else:
            x = nn.relu(nn.Dense(hidden, dtype=dt, name="fc_hidden")(
                drop(x)))
            logits = nn.Dense(c.num_classes, dtype=dt, name="fc_out")(
                drop(x))
        probs = nn.sigmoid(logits) if c.activationF == "sigmoid" \
            else nn.softmax(logits, axis=-1)
        return {"probs": probs}


class AggregatorConcat(nn.Module):
    """Concat-fusion baseline (aggregator_previous.py semantics)."""
    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 return_attn: bool = False):
        c = self.cfg
        parts = []
        if "CT" in c.modality:
            parts.append(_CTPooled(c.spacing[0], self.dtype,
                                   name="extractor_CT")(
                batch["input_CT"], train))
        if "pathology" in c.modality:
            pooled, _ = ABMIL(L=768, dtype=self.dtype,
                              use_pallas=resolve_use_pallas(
                                  c.use_pallas, raw_bag=True),
                              shard_axis=c.bag_shard_axis or None,
                              name="extractor_pathology")(
                batch["input_pathology"], batch.get("mask_pathology"),
                train)
            parts.append(pooled[:, 0])
        if batch.get("input_CI") is not None and \
                batch["input_CI"].dtype not in (jnp.int32, jnp.int64):
            parts.append(batch["input_CI"].astype(self.dtype))
        x = jnp.concatenate(parts, axis=-1)
        x = nn.relu(nn.Dense(EMBED_DIM, dtype=self.dtype, name="fc1")(x))
        logits = nn.Dense(c.num_classes, dtype=self.dtype, name="fc2")(x)
        probs = nn.sigmoid(logits) if c.activationF == "sigmoid" \
            else nn.softmax(logits, axis=-1)
        return {"probs": probs}
