"""End-to-end driver tests: fit() on synthetic data, checkpoint round-trip,
eval driver with threshold selection, run-dir naming parity."""

import os

import numpy as np
import jax
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, SyntheticCohort
from llmmil_tpu.models import build_model
from llmmil_tpu.train import create_train_state, make_train_step
from llmmil_tpu.train import checkpoint as ckpt_lib
from llmmil_tpu.utils.run_dir import make_save_dir


def _cfg(tmp_path, **kw):
    base = dict(modality=["pathology"], model_pathology="ABMIL",
                aggregator="ABMIL", model_CI="simpleFCs_v1",
                CI_input_version="v1", loss_point="Last",
                compute_dtype="float32", learnablePrompt=0,
                batch_size=4, bag_buckets=[128, 256, 512],
                save_dir=str(tmp_path), n_epochs=2, save_best=False,
                log_every=100)
    base.update(kw)
    return Config(**base)


def test_fit_synthetic_two_epochs(tmp_path):
    from llmmil_tpu.train.loop import fit

    cfg = _cfg(tmp_path)
    syn = SyntheticCohort(cfg, n_per_hospital=6, seed=3)
    tl = BatchLoader(syn.dataset(cfg, "train"), 4, shuffle=True,
                     drop_last=True, prefetch=0)
    vl = BatchLoader(syn.dataset(cfg, "valid"), 4, prefetch=0)
    summary = fit(cfg, tl, vl, use_mesh=False)
    assert summary["epoch"] == 1
    assert 0.0 <= summary["best_auc"] <= 1.0
    sd = summary["save_dir"]
    assert os.path.exists(os.path.join(sd, "config.txt"))
    assert os.path.exists(os.path.join(sd, "config.json"))
    assert os.path.exists(os.path.join(sd, "checkpoint_last.msgpack"))
    assert os.path.exists(os.path.join(sd, "metrics.jsonl"))
    # the run dir contains reference-style special chars; restore must work
    from llmmil_tpu.train import checkpoint as ck
    c = ck.load_checkpoint(sd)
    assert c["epoch"] == 2


def test_fit_with_8_device_mesh(tmp_path):
    """fit(use_mesh=True) on the virtual 8-device mesh: batch sharded,
    params replicated, metrics finite."""
    import jax
    from llmmil_tpu.train.loop import fit

    assert jax.device_count() >= 8
    cfg = _cfg(tmp_path, batch_size=8, n_epochs=1, mesh_shape=[8])
    syn = SyntheticCohort(cfg, n_per_hospital=12, seed=9)
    tl = BatchLoader(syn.dataset(cfg, "train"), 8, shuffle=True,
                     drop_last=True, prefetch=0)
    vl = BatchLoader(syn.dataset(cfg, "valid"), 8, drop_last=True,
                     prefetch=0)
    summary = fit(cfg, tl, vl, use_mesh=True)
    assert np.isfinite(summary["train"]["loss"])
    assert 0.0 <= summary["best_auc"] <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=4)
    loader = BatchLoader(syn.dataset(cfg, "train"), 4, prefetch=0)
    batch = next(iter(loader))
    init = {k: v for k, v in batch.items() if k != "ID"}
    model = build_model(cfg)
    state = create_train_state(model, cfg, init, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    state, _ = step(state, init, jax.random.PRNGKey(1))

    path = ckpt_lib.save_checkpoint(state, str(tmp_path), epoch=0,
                                    is_best=True)
    assert os.path.exists(path)
    assert os.path.exists(os.path.join(tmp_path,
                                       "checkpoint_best.msgpack"))

    state2 = create_train_state(model, cfg, init, jax.random.PRNGKey(9))
    state2, epoch, start_batch = ckpt_lib.resume(
        state2, os.path.join(tmp_path, "checkpoint_best"))
    assert epoch == 1
    assert start_batch == 0           # end-of-epoch save: no mid-epoch skip
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_reads_legacy_checkpoint_without_step_fields(tmp_path):
    """Checkpoints written before the ``step``/``batch_in_epoch`` fields
    existed must still resume (missing fields default to 0 — the old
    epoch-granular behavior)."""
    from flax import serialization

    cfg = _cfg(tmp_path)
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=4)
    batch = next(iter(BatchLoader(syn.dataset(cfg, "train"), 4,
                                  prefetch=0)))
    init = {k: v for k, v in batch.items() if k != "ID"}
    model = build_model(cfg)
    state = create_train_state(model, cfg, init, jax.random.PRNGKey(0))
    legacy = {"epoch": 3,
              "params": jax.tree_util.tree_map(np.asarray, state.params),
              "opt_state": jax.tree_util.tree_map(np.asarray,
                                                  state.opt_state),
              "batch_stats": state.batch_stats or {}}
    path = os.path.join(str(tmp_path), "legacy.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(legacy))
    state2, epoch, start_batch = ckpt_lib.resume(state, path)
    assert (epoch, start_batch) == (3, 0)
    assert int(state2.step) == 0


def test_jit_init_matches_eager_init(tmp_path):
    """create_train_state(jit_init=True) must produce the identical param
    tree as eager init from the same rng — fit()/evaluate() use the jitted
    path in production (one XLA program instead of per-op dispatch through
    the device tunnel)."""
    cfg = _cfg(tmp_path)
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=4)
    batch = next(iter(BatchLoader(syn.dataset(cfg, "train"), 4,
                                  prefetch=0)))
    init = {k: v for k, v in batch.items() if k != "ID"}
    model = build_model(cfg)
    eager = create_train_state(model, cfg, init, jax.random.PRNGKey(0))
    jitted = create_train_state(model, cfg, init, jax.random.PRNGKey(0),
                                jit_init=True)
    fa = jax.tree_util.tree_flatten_with_path(eager.params)[0]
    fb = jax.tree_util.tree_flatten_with_path(jitted.params)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (_, a), (_, b) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_resume_from_checkpoint(tmp_path):
    """--resume semantics (train_ddp.py:120-143): continue from
    checkpoint_last with epoch offset and identical params."""
    from llmmil_tpu.train.loop import fit

    cfg = _cfg(tmp_path, n_epochs=2)
    syn = SyntheticCohort(cfg, n_per_hospital=6, seed=13)
    tl = BatchLoader(syn.dataset(cfg, "train"), 4, shuffle=True,
                     drop_last=True, prefetch=0)
    vl = BatchLoader(syn.dataset(cfg, "valid"), 4, prefetch=0)
    s1 = fit(cfg, tl, vl, use_mesh=False)
    ckpt = os.path.join(s1["save_dir"], "checkpoint_last.msgpack")

    cfg2 = cfg.replace(resume=ckpt, n_epochs=3)
    s2 = fit(cfg2, tl, vl, use_mesh=False)
    # resumed run starts at epoch 2 and runs exactly epoch 2
    assert s2["epoch"] == 2


def test_restore_branch_intersection(tmp_path):
    """Partial restore copies only matching keys (train_ddp.py:154-166)."""
    cfg = _cfg(tmp_path, modality=["CI"], aggregator="-")
    model = build_model(cfg)
    batch = {"input_CI": np.ones((2, 9), np.float32),
             "label": np.eye(2, dtype=np.float32)[[0, 1]]}
    s1 = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    ckpt_lib.save_checkpoint(s1, str(tmp_path), epoch=0)

    s2 = create_train_state(model, cfg, batch, jax.random.PRNGKey(5))
    before_head = np.asarray(s2.params["fc"]["kernel"]).copy()
    s2 = ckpt_lib.restore_branch(
        s2, os.path.join(tmp_path, "checkpoint_0000.msgpack"),
        "clinic_extractor")
    # clinic_extractor now equals s1's; head untouched
    np.testing.assert_allclose(
        np.asarray(s2.params["clinic_extractor"]["fc0"]["kernel"]),
        np.asarray(s1.params["clinic_extractor"]["fc0"]["kernel"]))
    np.testing.assert_allclose(np.asarray(s2.params["fc"]["kernel"]),
                               before_head)


def test_evaluate_driver(tmp_path):
    from llmmil_tpu.eval import evaluate

    cfg = _cfg(tmp_path, mode="test", best_thres=0.5)
    syn = SyntheticCohort(cfg, n_per_hospital=6, seed=5)
    loader = BatchLoader(syn.dataset(cfg, "test"), 4, prefetch=0)
    res = evaluate(cfg, loader, out_dir=str(tmp_path / "pred"),
                   mode="test")
    assert 0.0 <= res["auc"] <= 1.0
    assert res["threshold"] == 0.5                  # test mode → best_thres
    assert os.path.exists(res["csv"])
    assert os.path.exists(os.path.join(tmp_path, "pred", "ROC.png"))
    assert len(res["table"]) == len(syn.dataset(cfg, "test").df)

    res_v = evaluate(cfg, loader, out_dir=str(tmp_path / "pred2"),
                     mode="valid")
    assert res_v["threshold"] == res_v["youden_threshold"]


def test_run_dir_naming_parity(tmp_path):
    cfg = Config(hospital_test=["EUMC", "HUMC", "SCHMC"],
                 modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", aggregator="TransMIL",
                 cancerstageTrain="1234", spacing=[0.6869, 0.6869, 3.0],
                 tumorCrop=0, val_fold=0, save_dir=str(tmp_path))
    d = make_save_dir(cfg, timestamp="T", create=False)
    assert d == os.path.join(
        str(tmp_path), "SavedModels",
        "EUMC+HUMC+SCHMC/modality(12)/stage_tr(1234)/"
        "resnetMC3_18-TransMIL(TransMIL)/norm_[0.6869,0.6869,3.0]/"
        "mask(X)/crop(X)/[0]T")
