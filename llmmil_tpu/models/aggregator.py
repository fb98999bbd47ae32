"""Flagship LLM-guided multimodal MIL model.

Parity target: ``model/aggregator.py`` (the paper model) plus the training
contract the reference's loop expects (``train_ddp.py:300,318-329``):
tri-modal forward returns THREE probability heads [fused, CT-only, Pth-only]
and the pair of CI-alignment embeddings [CT2CI, Pth2CI] for the cosine loss.
The checked-in reference aggregator only returns the fused head (its run dirs
snapshot per-experiment variants, SURVEY.md §2.8); this module implements the
superset behind one config switch.

Structure (aggregator.py:17-131):
  extractor_CT (model_CT) ─┐
  fc_pathology 768→512 Tanh + MIL extractor (model_pathology) ─┤
  clinic_extractor (model_CI / CoOp-CLIP) → fc_CI2CT / fc_CI2Pth (Tanh) ─┤
  TwoWayTransformer(depth 2, dim 512, heads 8, mlp 2048) fuses each
  modality's tokens with the projected CI; concat token streams → MIL
  aggregator (ABMIL/ABMIL_v2/TransMIL/TransMIL_seperate) → Dropout(0.25) +
  Linear → sigmoid/softmax.

TPU-native: batched + masked throughout (padded bag rows carry a mask),
sinusoidal PE computed at trace time (no 100k-row table), all branches are
static config so XLA sees one fixed graph per configuration.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..ops.positional import sinusoidal_pe
from .abmil import ABMIL, ABMILv2
from .clip_text import CoOpClinicalEncoder
from .ct_mc3 import MedicalNetFeatures, ResnetMC3_18
from .ct_mvit import MViTChunked
from .ct_r2plus1d import Resnet2plus1D_18
from .ct_swin import SwinUNETRMIL
from .simple_fcs import (SimpleFCsV1, SimpleFCsV1d, SimpleFCsV2,
                         SimpleFCsV2d)
from .transmil import TransMIL
from .twoway import TwoWayTransformer

EMBED_DIM = 512


def mask_centroids(m: jnp.ndarray) -> jnp.ndarray:
    """Per-sample tumour-mask centroid (B, 3) int32 from a (B, D, H, W) mask
    (reference ``get_center_of_mask``, swinUNETR_wMask.py:48-77)."""
    tot = jnp.maximum(m.sum(axis=(1, 2, 3)), 1.0)              # (B,)
    return jnp.stack([
        (m.sum(axis=(2, 3)) * jnp.arange(m.shape[1])).sum(1) / tot,
        (m.sum(axis=(1, 3)) * jnp.arange(m.shape[2])).sum(1) / tot,
        (m.sum(axis=(1, 2)) * jnp.arange(m.shape[3])).sum(1) / tot,
    ], axis=-1).astype(jnp.int32)


def make_ct_extractor(cfg: Config, dtype, name: str | None = None):
    """CT-extractor factory (aggregator.py:17-34 dispatch)."""
    if cfg.ct_remat == "auto" or cfg.swin_crop_chunk < 0:
        # drivers resolve 'auto' memory knobs with the run type
        # (fit/evaluate call resolve_memory_config); direct build_model
        # users get the memory-SAFE resolution (training assumptions)
        from ..config import resolve_memory_config
        cfg = resolve_memory_config(cfg, training=True)
    kw = {} if name is None else {"name": name}
    if cfg.ct_layers and cfg.model_CT not in ("resnetMC3_18",
                                              "resnetMC3_18_wMask"):
        # loud rejection: ct_layers only shapes the MC3 stages — silently
        # ignoring it for other trunks would mislead dryrun/debug users
        raise ValueError(
            f"ct_layers={cfg.ct_layers} is only honored by "
            f"resnetMC3_18/_wMask, not model_CT={cfg.model_CT!r}")
    if cfg.model_CT in ("resnetMC3_18", "resnetMC3_18_wMask"):
        if cfg.ct_layers:
            kw["layers"] = tuple(cfg.ct_layers)
        return ResnetMC3_18(spacing_xy=cfg.spacing[0], remat=cfg.ct_remat,
                            temporal_mode=cfg.ct_temporal_mode,
                            conv_backend=cfg.ct_conv_backend,
                            fwd_lowering=cfg.ct_fwd_lowering,
                            dtype=dtype, **kw)
    if cfg.model_CT == "medicalNet":
        return MedicalNetFeatures(dtype=dtype,
                                  temporal_mode=cfg.ct_temporal_mode, **kw)
    if cfg.model_CT == "resnet2plus1d_18":
        # the config default 'dfold' resolves to this trunk's measured
        # best, the mode-dependent 'auto' lowering (parity-exact either
        # way — see Resnet2plus1D_18 docstring); explicit
        # 'conv3d'/'dsum'/'dshift' still force a single form
        tm = cfg.ct_temporal_mode
        return Resnet2plus1D_18(dtype=dtype,
                                temporal_mode="auto" if tm == "dfold"
                                else tm, **kw)
    if "SwinUNETR" in cfg.model_CT:
        # 100 free crops vs 3 mask-centred crops (swinUNETR.py:27 /
        # swinUNETR_wMask.py:49); override for small/debug volumes
        n_sub = cfg.swin_n_subsample or (
            3 if "wMask" in cfg.model_CT else 100)
        crop = tuple(cfg.swin_crop) if cfg.swin_crop else (96, 96, 96)
        return SwinUNETRMIL(n_subsample=n_sub, crop=crop,
                            crop_chunk=cfg.swin_crop_chunk, dtype=dtype,
                            **kw)
    if cfg.model_CT == "MViT":
        mv_kw = dict(arch=cfg.mvit_arch)
        if cfg.mvit_depths:
            mv_kw["depths"] = tuple(cfg.mvit_depths)
        return MViTChunked(n_classes=cfg.num_classes, dtype=dtype,
                           **mv_kw, **kw)
    raise ValueError(f"unknown model_CT {cfg.model_CT}")


class Aggregator(nn.Module):
    cfg: Config
    dtype: jnp.dtype = jnp.float32
    # pipeline-parallel override for the CLIP text tower's resblock stack
    # (parallel/pp.py::clip_blocks_pipeline); param tree unchanged
    ci_blocks_fn: Optional[Any] = None

    def _ct_extractor(self):
        return make_ct_extractor(self.cfg, self.dtype, name="extractor_CT")

    def _clinic_extractor(self, name: str = "clinic_extractor"):
        c = self.cfg
        n = c.n_clinical
        if c.model_CI == "simpleFCs_v1":
            return SimpleFCsV1(n, self.dtype, name=name)
        if c.model_CI == "simpleFCs_v1d":
            return SimpleFCsV1d(n, self.dtype, name=name)
        if c.model_CI == "simpleFCs_v2":
            return SimpleFCsV2(self.dtype, name=name)
        if c.model_CI == "simpleFCs_v2d":
            return SimpleFCsV2d(self.dtype, name=name)
        if c.model_CI == "CLIP":
            from .clip_text import CLIPTextConfig
            tcfg = CLIPTextConfig(
                vocab_size=c.clip_vocab, context_length=c.clip_context,
                width=c.clip_width, heads=c.clip_heads, layers=c.clip_layers,
                embed_dim=c.clip_embed)
            return CoOpClinicalEncoder(
                n_prompts=n + 1, n_ctx=c.n_ctx,
                learnable=bool(c.learnablePrompt), cfg=tcfg,
                dtype=self.dtype, name=name,
                blocks_fn=self.ci_blocks_fn)
        raise ValueError(f"unknown model_CI {c.model_CI}")

    def _use_pallas(self) -> bool:
        # flagship pools fused 512-d streams — 'auto' resolves to off here
        # (XLA producer fusion wins; BENCH_NOTES r2 ruling)
        from ..ops.pallas import resolve_use_pallas
        return resolve_use_pallas(self.cfg.use_pallas, raw_bag=False)

    def _mil(self, name: str):
        c = self.cfg
        kind = c.aggregator
        if kind in ("ABMIL", "TransMIL_seperate"):
            # TransMIL_seperate's final pooling is ABMIL (aggregator.py:95-96)
            return ABMIL(L=EMBED_DIM, dtype=self.dtype,
                         use_pallas=self._use_pallas(), name=name)
        if kind == "ABMIL_v2":
            return ABMILv2(L=EMBED_DIM, dtype=self.dtype,
                           use_pallas=self._use_pallas(), name=name)
        if kind == "TransMIL":
            from .moe import spec_from_config
            return TransMIL(n_classes=c.num_classes, L=EMBED_DIM,
                            dtype=self.dtype, moe=spec_from_config(c),
                            pinv_iterations=c.nystrom_pinv_iters,
                            name=name)
        if kind == "TransMIL_per_modality":
            from .transmil_per_modality import TransMILPerModality
            return TransMILPerModality(
                n_classes=c.num_classes, L=EMBED_DIM,
                n_ci=c.n_clinical + 1, n_ct=c.ct_shape[0],
                dtype=self.dtype, name=name)
        raise ValueError(f"unknown aggregator {kind}")

    def _pool(self, mil, tokens, mask, train, bprc=None,
              return_attn=False):
        """Run a MIL aggregator, normalising its return to ((B, D), attn)."""
        from .transmil_per_modality import TransMILPerModality
        if isinstance(mil, (TransMIL, TransMILPerModality)):
            pooled, attn = mil(tokens, mask=mask, train=train,
                               return_attn=return_attn)
            return pooled, attn
        if isinstance(mil, ABMILv2):
            pooled, attn = mil(tokens, bprc, mask=mask, train=train)
        else:
            pooled, attn = mil(tokens, mask=mask, train=train)
        return pooled[:, 0], attn           # K=1 → squeeze

    def _activation(self, logits):
        if self.cfg.activationF == "sigmoid":
            return nn.sigmoid(logits)
        return nn.softmax(logits, axis=-1)

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 return_attn: bool = False):
        c = self.cfg
        dt = self.dtype
        has_ct = "CT" in c.modality
        has_pth = "pathology" in c.modality
        outputs: Dict[str, Any] = {}

        # ---- clinical branch -------------------------------------------
        def encode_ci(name):
            y = self._clinic_extractor(name)(batch["input_CI"])
            return y[:, None, :] if y.ndim == 2 else y

        if c.separate_CI_encoders and has_ct and has_pth:
            # aggregator_tmp: one CLIP text encoder per modality
            # (aggregator_tmp.py:120-126)
            x_ci_ct = encode_ci("clinic_extractor_CT")
            x_ci_pth = encode_ci("clinic_extractor_Pth")
            x_ci = x_ci_ct
        else:
            x_ci = encode_ci("clinic_extractor")
            x_ci_ct = x_ci_pth = x_ci

        def tanh_proj(x, name):
            return jnp.tanh(nn.Dense(EMBED_DIM, dtype=dt, name=name)(x))

        # ---- per-modality token extraction ------------------------------
        ct_tokens = pth_tokens = None
        pth_mask = batch.get("mask_pathology")
        if has_ct:
            if "ct_features" in batch:
                # precomputed extractor features: the reference's SwinUNETR
                # feature path (dataset.py:253-256) and the Grad-CAM hook
                feat = batch["ct_features"]
            else:
                ct_in = batch["input_CT"]
                if "SwinUNETR" in c.model_CT:
                    center = None
                    if "wMask" in c.model_CT and "mask_CT" in batch:
                        # SwinUNETR_wMask: crops constrained around each
                        # sample's tumour-mask centroid
                        # (swinUNETR_wMask.py:48-77)
                        center = mask_centroids(batch["mask_CT"][..., 0])
                    feat = self._ct_extractor()(ct_in, center=center,
                                                train=train)
                else:
                    if "wMask" in c.model_CT and "mask_CT" in batch:
                        # mask-aware variant: tumour mask as a 2nd input
                        # channel (resnetMC3_wMask.py:8-14 — the conv stem
                        # is channel-agnostic, so the same trunk serves both)
                        ct_in = jnp.concatenate(
                            [ct_in, batch["mask_CT"].astype(ct_in.dtype)],
                            axis=-1)
                    feat = self._ct_extractor()(ct_in, train=train)
            if isinstance(feat, tuple):                 # MViT → (emb, attn)
                feat = feat[0]
            if feat.ndim == 2:                          # pooled vector
                feat = feat[:, None, :]
            if feat.ndim == 3 and feat.shape[-1] != EMBED_DIM:
                feat = nn.Dense(EMBED_DIM, dtype=dt, name="fc_CT_proj")(feat)
            ct_tokens = feat                            # 5-D map or (B,T,512)
        if has_pth:
            pth_tokens = tanh_proj(batch["input_pathology"], "fc_pathology")

        ct_reduce = "flatten" if c.model_CT == "medicalNet" else "mean"

        def twoway(name):
            return TwoWayTransformer(
                depth=c.twoway_depth or 2, embedding_dim=EMBED_DIM,
                num_heads=8, mlp_dim=2048,
                ct_reduce=ct_reduce, dtype=dt, name=name)

        def pe_for(tokens):
            if tokens.ndim == 5:
                n = (tokens.shape[1] if ct_reduce == "mean"
                     else tokens.shape[1] * tokens.shape[2] * tokens.shape[3])
            else:
                n = tokens.shape[1]
            return sinusoidal_pe(n, EMBED_DIM, dtype=tokens.dtype)[None]

        # ---- alignment_base: which side of the TwoWayTransformer is the
        # query ("point") side (transformer.py:78-98).  The reference's
        # default config uses 'CI' (run_train.sh:81): CI is the query and the
        # modality tokens are the keys.  'CT'/'pathology' make that modality
        # the query side (the reference's CT-as-point path crashes on a
        # shape bug; this is the working superset).  Unknown values and
        # 'pathology' without a pathology branch are rejected loudly instead
        # of the reference's silent fall-through.
        ab = c.alignment_base
        if ab not in ("CT", "pathology", "CI", "none"):
            raise ValueError(f"unknown alignment_base {ab!r}")
        if ab == "CT" and not has_ct:
            raise ValueError("alignment_base='CT' without CT modality")
        if ab == "pathology" and not has_pth:
            raise ValueError("alignment_base='pathology' without pathology")

        def fuse(tw, tokens, tok_mask, ci, swap):
            """Cross-attend modality tokens with the projected CI.

            Returns (modality_emb, ci_emb, (modality_emb_mask, ci_emb_mask)):
            ``swap=False`` → CI is the query side (reference default);
            ``swap=True`` → the modality is the query side.  The first return
            is always the reference's ``x_<mod>2CI`` (the query-side output),
            the second the other side.
            """
            if swap:
                q, k = tw(ci, pe_for(ci), tokens, point_mask=tok_mask)
                return q, k, (tok_mask, None)
            q, k = tw(tokens, pe_for(tokens), ci, image_mask=tok_mask)
            return q, k, (None, tok_mask)

        def mask_or_ones(streams, masks):
            if all(m is None for m in masks):
                return None
            return jnp.concatenate(
                [jnp.broadcast_to(m, s.shape[:2]) if m is not None
                 else jnp.ones(s.shape[:2], bool)
                 for s, m in zip(streams, masks)], axis=1)

        attns = []
        emb_ct2ci = emb_pth2ci = None
        ct_emb_mask = pth_emb_mask = None
        pth_token_span = None       # (start, len, total) of the bag-instance
                                    # tokens inside x0 (eval/saliency.py
                                    # slices MIL attention rows with it)
        if has_ct and has_pth:
            if c.separate_CI_encoders:
                tw_ct = twoway("TwoWayTransformer_CT")
                tw_pth = twoway("TwoWayTransformer_Pth")
            else:
                tw_ct = tw_pth = twoway("TwoWayTransformer_Both")
            ci_ct = tanh_proj(x_ci_ct, "fc_CI2CT")
            ci_pth = tanh_proj(x_ci_pth, "fc_CI2Pth")
            emb_ct2ci, x_ci2ct, (ct_emb_mask, ci2ct_mask) = fuse(
                tw_ct, ct_tokens, None, ci_ct, swap=(ab == "CT"))
            emb_pth2ci, x_ci2pth, (pth_emb_mask, ci2pth_mask) = fuse(
                tw_pth, pth_tokens, pth_mask, ci_pth,
                swap=(ab == "pathology"))
            if c.separate_CI_encoders:
                # aggregator_tmp's 5-tuple contract (aggregator_tmp.py:204-211)
                outputs["emb_CI2CT"] = x_ci2ct
                outputs["emb_CI2Pth"] = x_ci2pth
            if c.aggregator == "TransMIL_seperate":
                agg_ct = TransMIL(c.num_classes, L=EMBED_DIM, dtype=dt,
                                  pinv_iterations=c.nystrom_pinv_iters,
                                  name="aggregator_CT")
                agg_pth = TransMIL(c.num_classes, L=EMBED_DIM, dtype=dt,
                                   pinv_iterations=c.nystrom_pinv_iters,
                                   name="aggregator_Pth")
                x_ci2ct = agg_ct(x_ci2ct, mask=ci2ct_mask,
                                 train=train)[0][:, None]
                x_ci2pth = agg_pth(x_ci2pth, mask=ci2pth_mask,
                                   train=train)[0][:, None]
                ci2ct_mask = ci2pth_mask = None
            streams = [emb_ct2ci, x_ci2ct, emb_pth2ci, x_ci2pth]
            masks = [ct_emb_mask, ci2ct_mask, pth_emb_mask, ci2pth_mask]
            x0 = jnp.concatenate(streams, axis=1)
            x0_mask = mask_or_ones(streams, masks)
            if ab != "pathology":   # x_ci2pth = TwoWay keys, 1 per instance
                pth_token_span = (x0.shape[1] - x_ci2pth.shape[1],
                                  x_ci2pth.shape[1], x0.shape[1])
        elif has_ct:
            tw = twoway("TwoWayTransformer_CT")
            ci_ct = tanh_proj(x_ci, "fc_CI2CT")
            emb_ct2ci, x_ci2ct, (ct_emb_mask, ci2ct_mask) = fuse(
                tw, ct_tokens, None, ci_ct, swap=(ab == "CT"))
            x0 = jnp.concatenate([emb_ct2ci, x_ci2ct], axis=1)
            x0_mask = None
        elif has_pth:
            tw = twoway("TwoWayTransformer_Pth")
            ci_pth = tanh_proj(x_ci, "fc_CI2Pth")
            emb_pth2ci, x_ci2pth, (pth_emb_mask, ci2pth_mask) = fuse(
                tw, pth_tokens, pth_mask, ci_pth, swap=(ab == "pathology"))
            streams = [emb_pth2ci, x_ci2pth]
            x0 = jnp.concatenate(streams, axis=1)
            x0_mask = mask_or_ones(streams, [pth_emb_mask, ci2pth_mask])
            if ab != "pathology":
                pth_token_span = (x0.shape[1] - x_ci2pth.shape[1],
                                  x_ci2pth.shape[1], x0.shape[1])
        else:                                            # CI-only
            x0 = tanh_proj(x_ci, "fc_CI")
            x0_mask = None

        # ---- MIL aggregation + heads ------------------------------------
        bprc = batch.get("BpRc_class")
        if bprc is None and c.aggregator == "ABMIL_v2":
            bprc = jnp.zeros((x0.shape[0], 1), dtype=x0.dtype)
        mil = self._mil("aggregator") if c.aggregator != "-" else None

        def head(tokens, mask, head_name):
            if mil is None:
                pooled = tokens.mean(axis=1)
            else:
                pooled, attn = self._pool(mil, tokens, mask, train, bprc,
                                          return_attn)
                if return_attn:
                    attns.append(attn)
            logits = nn.Dense(c.num_classes, dtype=dt, name=head_name)(
                nn.Dropout(0.25, deterministic=not train)(pooled))
            return self._activation(logits)

        outputs["probs"] = head(x0, x0_mask, "fc")

        if has_ct and has_pth and c.loss_point == "CT-Pth-Last":
            ct_streams = [emb_ct2ci, x_ci2ct]
            ct_stream = jnp.concatenate(ct_streams, axis=1)
            outputs["probs_CT"] = head(
                ct_stream, mask_or_ones(ct_streams, [ct_emb_mask, ci2ct_mask]),
                "fc_CT")
            pth_streams = [emb_pth2ci, x_ci2pth]
            pth_stream = jnp.concatenate(pth_streams, axis=1)
            outputs["probs_Pth"] = head(
                pth_stream,
                mask_or_ones(pth_streams, [pth_emb_mask, ci2pth_mask]),
                "fc_Pth")

        if emb_ct2ci is not None:
            outputs["emb_CT2CI"] = emb_ct2ci
        if emb_pth2ci is not None:
            outputs["emb_Pth2CI"] = emb_pth2ci
        if return_attn:
            outputs["attns"] = attns
            if pth_token_span is not None:
                # static ints (trace-time shapes) — consumers slice the
                # fused head's attention keys to the bag instances
                outputs["pth_token_span"] = pth_token_span
        return outputs


def build_model(cfg: Config):
    """Model factory (reference ``model/utils.py:6-12`` + the alternative
    ``model/utils_clip.py:6-8``): ``'wMask' in model_CT`` dispatches to the
    concat-fusion ``AggregatorWMask`` exactly like the reference's
    ``get_model`` (``wmask_family='twoway'`` keeps the mask as an extra
    channel into this framework's TwoWay flagship instead); ``model_family``
    selects the late-fusion (aggregator_clip) / concat (aggregator_previous)
    baselines."""
    dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else jnp.float32
    if "CT" in cfg.modality:
        known = ("resnetMC3_18", "resnetMC3_18_wMask", "medicalNet",
                 "resnet2plus1d_18", "MViT")
        if cfg.model_CT not in known and "SwinUNETR" not in cfg.model_CT:
            # fail fast here rather than minutes later inside model.init
            raise ValueError(f"unknown model_CT {cfg.model_CT!r}; "
                             f"expected one of {known} or *SwinUNETR*")
    if cfg.model_family == "clip":
        from .baselines import AggregatorClip
        return AggregatorClip(cfg=cfg, dtype=dtype)
    if cfg.model_family == "concat":
        from .baselines import AggregatorConcat
        return AggregatorConcat(cfg=cfg, dtype=dtype)
    if "wMask" in cfg.model_CT and cfg.wmask_family == "concat":
        from .baselines import AggregatorWMask
        return AggregatorWMask(cfg=cfg, dtype=dtype)
    return Aggregator(cfg=cfg, dtype=dtype)
