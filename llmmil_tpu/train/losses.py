"""Loss functions.

Parity targets: the reference's criterion selection (``train_ddp.py:94-101``:
BCELoss on sigmoid outputs for 2 classes, CrossEntropyLoss above),
CosineEmbeddingLoss for the textCosSim alignment term
(``train_ddp.py:101,325-329``), the CT+Pth+Last multi-head sum
(``train_ddp.py:318-324``), and the CLIP contrastive loss
(``utils.py:247-284``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_EPS = 1e-7


def bce_probs(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss on probabilities vs one-hot targets (mean)."""
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def ce_as_torch(outputs: jnp.ndarray, targets_onehot: jnp.ndarray
                ) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss semantics: inputs treated as logits (the
    reference feeds softmaxed outputs here for >2 classes — reproduced)."""
    logp = jax.nn.log_softmax(outputs, axis=-1)
    return -jnp.mean(jnp.sum(targets_onehot * logp, axis=-1))


def cosine_embedding_loss(x1: jnp.ndarray, x2: jnp.ndarray,
                          target: int = 1, margin: float = 0.0
                          ) -> jnp.ndarray:
    """torch.nn.CosineEmbeddingLoss; the reference only uses target=+1
    (pull CT2CI towards Pth2CI, train_ddp.py:266,325-327)."""
    cos = jnp.sum(x1 * x2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(x1, axis=-1) * jnp.linalg.norm(x2, axis=-1), _EPS)
    if target == 1:
        return jnp.mean(1.0 - cos)
    return jnp.mean(jnp.maximum(cos - margin, 0.0))


def _criterion(num_classes: int):
    return bce_probs if num_classes <= 2 else ce_as_torch


def multihead_loss(outputs: Dict[str, jnp.ndarray], targets: jnp.ndarray,
                   loss_point: str, loss_name: str, num_classes: int = 2
                   ) -> Dict[str, jnp.ndarray]:
    """CT + Pth + Last BCE sum (train_ddp.py:318-324) plus the optional
    textCosSim term (``:325-329``).  Returns a dict of named scalars with
    the total under 'loss'."""
    crit = _criterion(num_classes)
    terms: Dict[str, jnp.ndarray] = {}
    loss_last = crit(outputs["probs"], targets)
    if loss_point == "CT-Pth-Last" and "probs_CT" in outputs:
        terms["loss_CT"] = crit(outputs["probs_CT"], targets)
        terms["loss_Pth"] = crit(outputs["probs_Pth"], targets)
        terms["loss_Last"] = loss_last
        total = terms["loss_CT"] + terms["loss_Pth"] + loss_last
    else:
        total = loss_last
    if "textCosSim" in loss_name and "emb_CT2CI" in outputs \
            and "emb_Pth2CI" in outputs:
        cos = cosine_embedding_loss(outputs["emb_CT2CI"][:, 0],
                                    outputs["emb_Pth2CI"][:, 0])
        terms["loss_CosSim"] = cos
        total = total + cos
    terms["loss"] = total
    return terms


def clip_contrastive_loss(features: jnp.ndarray, text_features: jnp.ndarray,
                          logit_scale: float = 100.0) -> jnp.ndarray:
    """CLIPloss_v1 equivalent (utils.py:247-284): cross-entropy between
    scaled feature/text similarity logits and identity labels."""
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), _EPS)
    t = text_features / jnp.maximum(
        jnp.linalg.norm(text_features, axis=-1, keepdims=True), _EPS)
    logits = logit_scale * f @ t.T
    n = logits.shape[0]
    labels = jax.nn.one_hot(jnp.arange(n), logits.shape[-1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))
