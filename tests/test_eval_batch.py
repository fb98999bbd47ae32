"""Batched eval serving (--eval_batch, beyond reference test_ddp.py:73).

Invariants: per-patient probabilities are identical (float tolerance)
between batch-1 and batch-4 serving — batching only changes throughput —
and the driver reports patients/s alongside the reference's ms/patient.
"""

import numpy as np

from llmmil_tpu.config import Config
from llmmil_tpu.data.pipeline import BatchLoader, SyntheticCohort
from llmmil_tpu.eval import evaluate


def _cfg():
    return Config(modality=["pathology"], model_pathology="ABMIL",
                  aggregator="ABMIL", model_CI="simpleFCs_v1",
                  CI_input_version="v1", loss_point="Last",
                  learnablePrompt=0, compute_dtype="float32",
                  augmentation=0, bag_buckets=[64, 128, 256, 512])


def test_eval_batch4_matches_batch1(tmp_path):
    cfg = _cfg()
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=0)
    ds1 = syn.dataset(cfg, "test")
    ds4 = syn.dataset(cfg, "test")
    assert len(ds1) >= 8

    r1 = evaluate(cfg, BatchLoader(ds1, 1, shuffle=False),
                  out_dir=str(tmp_path / "b1"), mode="test")
    r4 = evaluate(cfg, BatchLoader(ds4, 4, shuffle=False),
                  out_dir=str(tmp_path / "b4"), mode="test")

    t1 = r1["table"].sort_values("ID").reset_index(drop=True)
    t4 = r4["table"].sort_values("ID").reset_index(drop=True)
    assert list(t1["ID"]) == list(t4["ID"])
    # same patients, same probs: batch-4 may pad each patient to a
    # DIFFERENT bucket than batch-1 — the masked paths make that invisible
    np.testing.assert_allclose(t4["prob"].to_numpy(),
                               t1["prob"].to_numpy(), atol=2e-5)
    assert r4["auc"] == r1["auc"] or abs(r4["auc"] - r1["auc"]) < 1e-6
    assert r1["patients_per_sec"] > 0 and r4["patients_per_sec"] > 0
