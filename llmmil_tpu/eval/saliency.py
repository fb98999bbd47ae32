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
