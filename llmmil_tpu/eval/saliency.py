"""Per-patient interpretability maps: input saliency and Grad-CAM.

Parity target: the reference exposes ``--watch_ID`` and
``--map_type ∈ {saliencyMap, gradCAM}`` flags (``config.py:137-138``; the
producing script is not in the reference tree — this module supplies the
capability).  Saliency = |∂P(class)/∂CT input|; Grad-CAM = ReLU of the
channel-weighted layer4 activation map, weights = spatially-pooled grads.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import build_model


def save_patient_maps(cfg: Config, state, loader, out_dir: str) -> Dict:
    """Write ``cfg.watch_ID``'s interpretability map(s) under
    ``out_dir/maps/`` — the consumer of the reference's ``--watch_ID`` /
    ``--map_type`` flags (``config.py:137-138``).

    ``cfg.map_type``: 'saliencyMap' | 'gradCAM' | 'pathologyAttn' | 'all'.
    Returns {map_type: path} for what was written.
    """
    import os

    variables = {"params": state.params}
    if state.batch_stats is not None and jax.tree_util.tree_leaves(
            state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    batch = None
    for b in loader:
        ids = list(b["ID"])
        if cfg.watch_ID in ids:
            i = ids.index(cfg.watch_ID)
            batch = {k: (v if k == "ID" else np.asarray(v)[i:i + 1])
                     for k, v in b.items()}
            batch["ID"] = [cfg.watch_ID]
            break
    if batch is None:
        raise ValueError(
            f"watch_ID {cfg.watch_ID!r} not found in the evaluation "
            "cohort — set --watch_ID to a patient in the tested split")
    feed = {k: v for k, v in batch.items() if k not in ("ID", "label")}

    kinds = (["saliencyMap", "gradCAM", "pathologyAttn"]
             if cfg.map_type == "all" else [cfg.map_type])
    os.makedirs(os.path.join(out_dir, "maps"), exist_ok=True)
    written: Dict = {}
    for kind in kinds:
        if kind == "saliencyMap":
            arr = saliency_map(cfg, variables, feed)
        elif kind == "gradCAM":
            arr = grad_cam(cfg, variables, feed)
        elif kind == "pathologyAttn":
            arr = pathology_attention(cfg, variables, feed)
        else:
            raise ValueError(
                f"unknown map_type {kind!r}; expected saliencyMap, "
                "gradCAM, pathologyAttn or all")
        path = os.path.join(out_dir, "maps", f"{cfg.watch_ID}_{kind}.npy")
        np.save(path, arr[0])
        written[kind] = path
        print(f"=> wrote {kind} for {cfg.watch_ID}: {path} "
              f"shape={arr[0].shape}")
    return written


def _sub_variables(variables: Dict, branch: str) -> Dict:
    sub = {"params": variables["params"][branch]}
    bs = variables.get("batch_stats") or {}
    if branch in bs:
        sub["batch_stats"] = bs[branch]
    return sub


def saliency_map(cfg: Config, variables: Dict, batch: Dict,
                 class_idx: int = 1) -> np.ndarray:
    """|∂ P(class)/∂ input_CT|, shape = input_CT's (B, D, H, W, 1)."""
    model = build_model(cfg)

    def score(ct):
        out = model.apply(variables, {**batch, "input_CT": ct},
                          train=False)
        return out["probs"][:, class_idx].sum()

    g = jax.grad(score)(batch["input_CT"])
    return np.abs(np.asarray(g))


def pathology_attention(cfg: Config, variables: Dict, batch: Dict,
                        layer: int = -1) -> np.ndarray:
    """Per-instance MIL attention over the pathology bag → (B, N_bag).

    The matching capability for the reference's TransMIL attention
    returns (``model/dim1/TransMIL.py:86-107``): the fused head's MIL
    attention restricted to the bag-instance tokens (the TwoWay keys are
    1:1 with bag instances — ``model/sam/transformer.py``'s image path),
    cls-row for TransMIL (``layer`` picks which TransLayer, default the
    last), pooling weights for ABMIL.  Masked instances get weight 0 and
    the rest renormalise to sum 1 per patient.
    """
    model = build_model(cfg)
    out = model.apply(variables, batch, train=False, return_attn=True)
    attns = out.get("attns")
    span = out.get("pth_token_span")
    if not attns or span is None:
        raise ValueError(
            "pathology attention needs modality containing 'pathology', "
            "a MIL aggregator, and alignment_base != 'pathology' "
            f"(got modality={cfg.modality}, aggregator={cfg.aggregator})")
    start, length, total = span
    a = attns[0]                               # the fused 'fc' head
    if isinstance(a, list):                    # TransMIL: factored maps
        fac = a[layer]
        if fac is None:
            raise ValueError("TransMIL returned no attention factors")
        from ..ops.nystrom import nystrom_attn_rows
        row = np.asarray(nystrom_attn_rows(fac, 0))[:, :, 0, :]  # (B,H,N)
        w = row.mean(axis=1)                   # mean over heads
        w = w[:, 1:]                           # drop the cls column
        # wrap-pad columns duplicate the first tokens (square pad,
        # TransMIL.py:66-69) — fold their mass back onto the sources
        main, wrap = w[:, :total], w[:, total:]
        if wrap.shape[1]:
            main = np.concatenate(
                [main[:, :wrap.shape[1]] + wrap, main[:, wrap.shape[1]:]],
                axis=1)
        w = main
    else:                                      # ABMIL: (B, K, N) weights
        w = np.asarray(a)
        if w.ndim == 3:
            w = w[:, 0]
    inst = w[:, start:start + length].astype(np.float64)
    mask = batch.get("mask_pathology")
    if mask is not None:
        inst = inst * np.asarray(mask, np.float64)
    denom = inst.sum(axis=1, keepdims=True)
    return (inst / np.where(denom == 0, 1.0, denom)).astype(np.float32)


def grad_cam(cfg: Config, variables: Dict, batch: Dict,
             class_idx: int = 1) -> np.ndarray:
    """Grad-CAM over the CT extractor's layer4 NDHWC map →
    (B, D', H', W') non-negative heatmap."""
    model = build_model(cfg)
    from ..models.aggregator import make_ct_extractor
    extractor = make_ct_extractor(cfg, model.dtype)
    fmap = extractor.apply(_sub_variables(variables, "extractor_CT"),
                           batch["input_CT"], train=False)
    if isinstance(fmap, tuple):
        fmap = fmap[0]

    def head_score(fmap):
        out = model.apply(variables, {**batch, "ct_features": fmap},
                          train=False)
        return out["probs"][:, class_idx].sum()

    grads = jax.grad(head_score)(fmap)
    weights = jnp.mean(grads, axis=tuple(range(1, grads.ndim - 1)),
                       keepdims=True)
    cam = jax.nn.relu(jnp.sum(weights * fmap, axis=-1))
    return np.asarray(cam)
