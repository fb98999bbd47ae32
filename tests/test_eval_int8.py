"""evaluate(ct_int8=N) — the int8-CT serving mode (eval/quant.py).

Unlike depth sharding (exact), int8 is approximate: probs must stay close
to the float path and the mode must be calibrated/wired correctly.
"""

import numpy as np
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, SyntheticCohort
from llmmil_tpu.eval import evaluate


def _cfg():
    return Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                  model_pathology="TransMIL", model_CI="CLIP",
                  CI_input_version="text", aggregator="TransMIL",
                  loss_point="CT-Pth-Last", spacing=[2.0, 2.0, 2.5],
                  compute_dtype="float32", ct_temporal_mode="dfold",
                  clip_vocab=64, clip_context=16, clip_width=32,
                  clip_heads=4, clip_layers=1, clip_embed=16,
                  ct_shape=[16, 32, 32], bag_buckets=[64],
                  mode="test", best_thres=0.5, batch_size=1)


def test_evaluate_int8_close_to_float(tmp_path):
    cfg = _cfg()
    syn = SyntheticCohort(cfg, n_per_hospital=1, seed=13)
    loader = BatchLoader(syn.dataset(cfg, "test"), 1, prefetch=0)

    res0 = evaluate(cfg, loader, out_dir=str(tmp_path / "f"), mode="test")
    res8 = evaluate(cfg, loader, out_dir=str(tmp_path / "q"), mode="test",
                    ct_int8=1)
    assert list(res0["table"]["ID"]) == list(res8["table"]["ID"])
    p0 = res0["table"]["prob"].to_numpy()
    p8 = res8["table"]["prob"].to_numpy()
    assert np.all(np.isfinite(p8))
    # quantization error on an untrained net: probs close, not identical
    np.testing.assert_allclose(p8, p0, atol=0.05)


def test_int8_and_depth_shard_mutually_exclusive(tmp_path):
    cfg = _cfg()
    syn = SyntheticCohort(cfg, n_per_hospital=1, seed=13)
    loader = BatchLoader(syn.dataset(cfg, "test"), 1, prefetch=0)
    with pytest.raises(ValueError, match="mutually exclusive"):
        evaluate(cfg, loader, out_dir=str(tmp_path), mode="test",
                 ct_depth_shard=8, ct_int8=1)
