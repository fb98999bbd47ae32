"""Seeding determinism: same seed → identical init, training trajectory,
and data order (the reference's --seed + cudnn.deterministic contract,
train_ddp.py:602-614)."""

import numpy as np
import jax
import jax.numpy as jnp

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, SyntheticCohort
from llmmil_tpu.models import build_model
from llmmil_tpu.train import create_train_state, make_train_step


def _run(seed):
    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 loss_point="Last", compute_dtype="float32",
                 learnablePrompt=0, batch_size=4, seed=seed,
                 bag_buckets=[128])
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=seed)
    loader = BatchLoader(syn.dataset(cfg, "train"), 4, shuffle=True,
                         seed=seed, drop_last=True, prefetch=0)
    batch = next(iter(loader))
    init = {k: v for k, v in batch.items() if k != "ID"}
    model = build_model(cfg)
    state = create_train_state(model, cfg, init, jax.random.PRNGKey(seed))
    step = make_train_step(cfg, donate=False)
    losses = []
    for i in range(3):
        state, m = step(state, init, jax.random.PRNGKey(seed))
        losses.append(float(m["loss"]))
    return batch["ID"], losses, state.params["fc"]["kernel"]


def test_same_seed_identical_run():
    ids1, losses1, k1 = _run(11)
    ids2, losses2, k2 = _run(11)
    assert ids1 == ids2
    assert losses1 == losses2
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_different_seed_differs():
    ids1, losses1, _ = _run(11)
    ids2, losses2, _ = _run(12)
    assert losses1 != losses2
