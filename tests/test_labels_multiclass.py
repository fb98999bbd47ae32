"""Label-variant selection (dataset.py label switch) and the >2-class
training path (CE criterion + macro metrics, train_ddp.py:95-97,365-377)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, SyntheticCohort
from llmmil_tpu.models import build_model
from llmmil_tpu.train import create_train_state, make_train_step
from llmmil_tpu.train.losses import multihead_loss
from llmmil_tpu.train.metrics import precision_recall


def test_label_variants():
    cfg = Config(modality=["pathology"], model_CI="simpleFCs_v1",
                 learnablePrompt=0)
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=2)
    ds = syn.dataset(cfg, "train")
    row = ds.df.iloc[0]

    # 5yOS (default): one-hot of the survival label
    y = ds._label(row)
    assert y.shape == (2,) and y.sum() == 1

    # BpRs: Biopsy=0 / Resection=1 (dataset.py label='BpRs')
    ds.cfg = cfg.replace(label="BpRs")
    y = ds._label(row)
    assert np.argmax(y) == (0 if row["pathologyimage"] == "Biopsy" else 1)

    # locationcancer: 5 classes, 1-indexed in the table
    ds.cfg = cfg.replace(label="locationcancer", num_classes=5)
    y = ds._label(row)
    assert y.shape == (5,) and np.argmax(y) == row["locationcancer"] - 1

    # classification_cancer: 2 classes, 1-indexed
    ds.cfg = cfg.replace(label="classification_cancer", num_classes=2)
    y = ds._label(row)
    assert np.argmax(y) == row["classification cancer"] - 1


def test_multiclass_training_path():
    """num_classes=5 → softmax head + CE loss + macro precision/recall."""
    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 loss_point="Last", compute_dtype="float32",
                 learnablePrompt=0, num_classes=5, activationF="softmax",
                 batch_size=4)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    batch = {
        "input_pathology": jnp.asarray(rs.randn(4, 64, 768), jnp.float32),
        "mask_pathology": jnp.ones((4, 64), bool),
        "input_CI": jnp.asarray(rs.randn(4, 9), jnp.float32),
        "label": jnp.asarray(np.eye(5)[rs.randint(0, 5, 4)], jnp.float32),
    }
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    losses = []
    for _ in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # probs are a softmax distribution
    p = np.asarray(m["probs"])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)

    # CE term matches torch semantics for >2 classes
    terms = multihead_loss({"probs": batch["label"] * 0.9 + 0.02},
                           batch["label"], "Last", "BCE", num_classes=5)
    assert np.isfinite(float(terms["loss"]))

    # macro precision/recall path
    prec, rec = precision_recall([0, 1, 2, 2], [0, 1, 1, 2], "macro")
    assert 0 <= prec <= 1 and 0 <= rec <= 1
