"""Auto memory-config resolution (Config.ct_remat='auto',
swin_crop_chunk=-1) — the zoo6 OOM rows train out-of-the-box.

The reference trains any batch without per-config surgery
(train_ddp.py:75-76); on a 16 GB chip the working settings are
batch/model-dependent (BENCH_NOTES r3 zoo6 table), so the drivers
resolve them automatically and loudly.  The OOMs themselves can't
reproduce on CPU — these tests pin the RESOLUTION and that the
previously-OOMing configurations build and take a training step.
"""

import numpy as np
import jax

from llmmil_tpu.config import Config, resolve_memory_config


def test_resolution_table(capsys):
    # training, batch>=2: the layer2 compile-OOM row -> 'early', loudly
    c = resolve_memory_config(Config(batch_size=2), training=True)
    assert c.ct_remat == "early"
    assert "ct_remat" in capsys.readouterr().out

    # training, batch 1: the measured fastest-fitting default
    assert resolve_memory_config(Config(batch_size=1),
                                 training=True).ct_remat == "layer2"
    # eval: remat only affects gradients -> cheap default
    assert resolve_memory_config(Config(batch_size=8),
                                 training=False).ct_remat == "layer2"

    # SwinUNETR training: the 100-crop grad OOM row -> chunk 10, loudly
    c = resolve_memory_config(Config(model_CT="SwinUNETR"), training=True)
    assert c.swin_crop_chunk == 10
    assert "swin_crop_chunk" in capsys.readouterr().out
    # SwinUNETR serving keeps the measured eval chunk
    assert resolve_memory_config(Config(model_CT="SwinUNETR"),
                                 training=False).swin_crop_chunk == 25

    # explicit values always pass through untouched
    c = resolve_memory_config(Config(ct_remat="none", swin_crop_chunk=7,
                                     batch_size=4), training=True)
    assert c.ct_remat == "none" and c.swin_crop_chunk == 7


def test_oom_rows_train_out_of_the_box(tmp_path):
    """The zoo6 OOM configurations (flagship batch>=2; SwinUNETR train)
    at CPU-small shapes: fit() resolves the knobs and takes steps."""
    from llmmil_tpu.data.pipeline import BatchLoader, SyntheticCohort
    from llmmil_tpu.train.loop import fit

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="ABMIL", aggregator="ABMIL",
                 model_CI="simpleFCs_v1", CI_input_version="v1",
                 loss_point="Last", learnablePrompt=0,
                 compute_dtype="float32", batch_size=2, n_epochs=1,
                 spacing=[2.0, 2.0, 2.5], ct_hw_override=16,
                 ct_shape=[8, 16, 16], ct_layers=[1, 1, 1, 1],
                 bag_buckets=[32, 64], num_workers=0, device_prefetch=0,
                 save_dir=str(tmp_path), augmentation=0,
                 handle_preemption=False)
    assert cfg.ct_remat == "auto"                  # the default under test
    syn = SyntheticCohort(cfg, n_per_hospital=2, ct_shape=(8, 16, 16),
                          bag_range=(8, 30), seed=0)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    res = fit(cfg, BatchLoader(syn.dataset(cfg, "train"), 2),
              BatchLoader(syn.dataset(cfg, "valid"), 2),
              save_dir=str(run_dir), use_mesh=False)
    assert np.isfinite(res["best_auc"]) or res["best_auc"] >= 0
