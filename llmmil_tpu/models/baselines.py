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
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from .abmil import ABMIL
from .aggregator import EMBED_DIM
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
