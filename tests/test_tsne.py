"""Per-modality TSNE analysis script (scripts/plot_tsne.py) — synthetic.

Parity target: plot_TSNE_data_distribution.py:308-412 — separate CT /
pathology / CI matrices with aligned rows, per-hospital grouping, [0,1]
coordinate rescale.
"""

import importlib.util
import os
import sys

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "plot_tsne", os.path.join(os.path.dirname(__file__), "..",
                              "scripts", "plot_tsne.py"))
plot_tsne = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plot_tsne)

from llmmil_tpu.config import Config


def _cfg(**kw):
    return Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                  model_CI="CLIP", CI_input_version="text",
                  aggregator="TransMIL", loss_point="Last",
                  compute_dtype="float32", spacing=[2.0, 2.0, 2.5],
                  ct_hw_override=96, ct_shape=[16, 96, 96],
                  clip_vocab=64, clip_context=16, clip_width=32,
                  clip_heads=4, clip_layers=1, clip_embed=16,
                  num_workers=0, **kw)


def test_per_modality_matrices_and_script(tmp_path):
    cfg = _cfg()
    mats, hosp = plot_tsne.collect_modality_matrices(
        cfg, plot_tsne.INTERNAL + plot_tsne.EXTERNAL, synthetic=True,
        max_per_hospital=3, n_synth=3)
    # one matrix per modality, rows aligned
    assert set(mats) == {"CT", "pathology", "CI"}
    n = len(hosp)
    assert all(m.shape[0] == n for m in mats.values())
    assert set(hosp) == set(plot_tsne.INTERNAL + plot_tsne.EXTERNAL)
    # CI rows are CLIP text embeddings, not raw token ids
    assert mats["CI"].shape[1] == cfg.clip_embed
    assert mats["CI"].dtype == np.float32
    # bags zero-padded to a common width then flattened
    assert mats["pathology"].shape[1] % 768 == 0

    for modality, X in mats.items():
        emb = plot_tsne.tsne_embed(X, seed=0)
        assert emb.shape == (n, 2)
        png = str(tmp_path / f"T-SNE({modality}).png")
        plot_tsne.plot_modality(emb, hosp, png, modality, "hospital")
        plot_tsne.plot_modality(emb, hosp, png, modality, "cohort")
        assert os.path.exists(png)


def test_scale_to_01_range():
    x = np.array([3.0, -1.0, 7.0])
    s = plot_tsne.scale_to_01_range(x)
    assert s.min() >= 0 and s.max() <= 1.0 + 1e-9
    np.testing.assert_allclose(s[2], 1.0, atol=1e-9)
