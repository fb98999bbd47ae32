"""evaluate(ct_depth_shard=8) ≡ unsharded evaluate (VERDICT r2 #6).

The --ct_depth_shard serving flag routes CT extraction through the
depth-sharded trunk (parallel/sp_ct.py) inside the jitted forward; probs,
AUC, and the per-patient table must be identical to the unsharded path.
"""

import numpy as np
import jax

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, SyntheticCohort
from llmmil_tpu.eval import evaluate


def test_evaluate_depth_sharded_matches_unsharded(tmp_path):
    assert jax.device_count() >= 8
    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", aggregator="TransMIL",
                 loss_point="CT-Pth-Last", spacing=[2.0, 2.0, 2.5],
                 compute_dtype="float32", ct_temporal_mode="dfold",
                 clip_vocab=64, clip_context=16, clip_width=32,
                 clip_heads=4, clip_layers=1, clip_embed=16,
                 ct_shape=[16, 32, 32], bag_buckets=[64],
                 mode="test", best_thres=0.5, batch_size=1)
    syn = SyntheticCohort(cfg, n_per_hospital=2, seed=11)
    loader = BatchLoader(syn.dataset(cfg, "test"), 1, prefetch=0)

    res0 = evaluate(cfg, loader, out_dir=str(tmp_path / "p0"), mode="test")
    res8 = evaluate(cfg, loader, out_dir=str(tmp_path / "p8"), mode="test",
                    ct_depth_shard=8)
    assert list(res0["table"]["ID"]) == list(res8["table"]["ID"])
    # finiteness first: assert_allclose treats NaN==NaN as equal, which
    # silently passed while OOB fallback-tokenizer ids NaN'd the CLIP
    # embeddings (fixed in data/tokenizer.py::ClipTokenizer vocab_size)
    assert np.all(np.isfinite(res0["table"]["prob"].to_numpy()))
    np.testing.assert_allclose(res8["table"]["prob"].to_numpy(),
                               res0["table"]["prob"].to_numpy(),
                               atol=1e-5, rtol=1e-5)
    assert res0["auc"] == res8["auc"]
