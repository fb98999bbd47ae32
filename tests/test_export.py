"""Serving-export artifact (eval/export.py, jax.export StableHLO).

Invariants:
- artifact outputs are bit-identical to the live jitted forward on the
  same platform (params baked in as constants; the eager per-op path
  differs at ~1e-7 because fusion changes rounding, same as any jit);
- the artifact round-trips through bytes/disk and runs WITHOUT the live
  variables;
- multiple shape entries dispatch by signature; unknown signatures raise
  with the available list;
- the manifest records config + signatures.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmmil_tpu.config import Config
from llmmil_tpu.eval.export import (ServingModel, export_model,
                                    load_artifact, make_example_batch,
                                    save_artifact)
from llmmil_tpu.models import build_model


def _cfg():
    return Config(modality=["pathology"], model_pathology="ABMIL",
                  aggregator="ABMIL", model_CI="simpleFCs_v1",
                  CI_input_version="v1", loss_point="Last",
                  compute_dtype="float32", learnablePrompt=0,
                  bag_buckets=[32, 64])


def _batch(cfg, B, N, seed=0):
    rs = np.random.RandomState(seed)
    return {"input_pathology": jnp.asarray(rs.randn(B, N, 768),
                                           jnp.float32),
            "mask_pathology": jnp.asarray(
                np.arange(N)[None] < rs.randint(N // 2, N, (B, 1))),
            "input_CI": jnp.asarray(rs.rand(B, 9), jnp.float32),
            "label": jnp.asarray(np.eye(2)[rs.randint(0, 2, B)],
                                 jnp.float32)}


def test_export_roundtrip_bit_exact(tmp_path):
    cfg = _cfg()
    model = build_model(cfg)
    ex32 = {k: v for k, v in _batch(cfg, 2, 32).items() if k != "label"}
    ex64 = {k: v for k, v in _batch(cfg, 2, 64).items() if k != "label"}
    variables = model.init(jax.random.PRNGKey(0), ex32)

    blob = export_model(cfg, variables, [ex32, ex64], platforms=("cpu",))
    path = str(tmp_path / "model.llmmil")
    save_artifact(path, blob)
    served = load_artifact(path)
    assert len(served.signatures) == 2
    assert served.manifest["config"]["model_pathology"] == "ABMIL"

    jfwd = jax.jit(lambda b: model.apply(variables, b,
                                          train=False)["probs"])
    for ex in (ex32, ex64):
        want = jfwd(ex)
        got = served.call(ex)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # fresh inputs through the same entries (values differ, shapes match)
    ex_new = {k: v for k, v in _batch(cfg, 2, 64, seed=3).items()
              if k != "label"}
    want = jfwd(ex_new)
    np.testing.assert_array_equal(np.asarray(served.call(ex_new)),
                                  np.asarray(want))

    # unknown signature -> KeyError naming what's available
    bad = {k: v for k, v in _batch(cfg, 3, 48).items() if k != "label"}
    with pytest.raises(KeyError, match="available"):
        served.call(bad)


def test_make_example_batch_shapes():
    cfg = _cfg()
    ex = make_example_batch(cfg, batch=2)
    assert ex["input_pathology"].shape == (2, 64, 768)   # last bucket
    assert ex["input_CI"].shape == (2, 9)                # v1 vector
    cfg2 = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                  model_CI="CLIP", CI_input_version="text",
                  CI_prompt_version="devided", spacing=[2.0, 2.0, 2.5],
                  prompt_len=8, ct_hw_override=32)
    ex2 = make_example_batch(cfg2, batch=1, bag=16, ct_depth=8)
    assert ex2["input_CT"].shape == (1, 8, 32, 32, 1)
    assert ex2["input_pathology"].shape == (1, 16, 768)
    # devided prompts: n_clinical+1 rows, context shortened by prompt_len
    assert ex2["input_CI"].shape == (1, 10, cfg2.clip_context - 8)
    # EOT id at the end so argmax-EOT pooling hits the last position
    assert int(np.asarray(ex2["input_CI"])[0, 0, -1]) == cfg2.clip_vocab - 1


def test_multi_platform_export_runs_on_cpu():
    """The default ('tpu','cpu') artifact lowers fine on a CPU-only host
    and executes on cpu; the extra platform costs ~KBs (the artifact is
    weight-dominated — measured: tiny flagship 93.877 vs 93.890 MB)."""
    cfg = _cfg()
    model = build_model(cfg)
    ex = {k: v for k, v in _batch(cfg, 1, 32).items() if k != "label"}
    variables = model.init(jax.random.PRNGKey(0), ex)
    blob = export_model(cfg, variables, [ex], platforms=("tpu", "cpu"))
    served = ServingModel(blob)
    assert served.manifest["platforms"] == ["tpu", "cpu"]
    want = np.asarray(jax.jit(
        lambda b: model.apply(variables, b, train=False)["probs"])(ex))
    np.testing.assert_array_equal(np.asarray(served.call(ex)), want)


def test_eval_driver_serves_from_artifact(tmp_path):
    """scripts/test.py --artifact: the eval driver run from a frozen
    artifact produces the same per-patient probabilities as the live
    model + fresh-init state (both paths seed PRNGKey(0))."""
    from llmmil_tpu.data import BatchLoader, SyntheticCohort
    from llmmil_tpu.eval import evaluate
    from llmmil_tpu.train.state import create_train_state

    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 CI_input_version="v1", loss_point="Last",
                 compute_dtype="float32", learnablePrompt=0,
                 bag_buckets=[64], mode="test", best_thres=0.5,
                 batch_size=1)
    syn = SyntheticCohort(cfg, n_per_hospital=1, seed=13)
    loader = BatchLoader(syn.dataset(cfg, "test"), 1, prefetch=0)

    res_live = evaluate(cfg, loader, out_dir=str(tmp_path / "live"),
                        mode="test")

    # rebuild the exact state evaluate() used (same PRNGKey(0) init)
    model = build_model(cfg)
    first = loader.first_batch()
    init_batch = {k: v for k, v in first.items() if k != "ID"}
    state = create_train_state(model, cfg, init_batch,
                               jax.random.PRNGKey(0), jit_init=True)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    ex = {k: v for k, v in init_batch.items() if k != "label"}
    path = str(tmp_path / "m.llmmil")
    save_artifact(path, export_model(cfg, variables, [ex],
                                     platforms=("cpu",)))

    res_art = evaluate(cfg, loader, out_dir=str(tmp_path / "art"),
                       mode="test", artifact=path)
    assert list(res_live["table"]["ID"]) == list(res_art["table"]["ID"])
    # the live driver passes params as jit ARGUMENTS, the artifact bakes
    # them as CONSTANTS — XLA constant-folding changes fusion rounding at
    # the last ulp (~1e-7), so this comparison is float-tolerance; the
    # bit-exact pin (same program form both sides) is
    # test_export_roundtrip_bit_exact
    np.testing.assert_allclose(res_art["table"]["prob"].to_numpy(),
                               res_live["table"]["prob"].to_numpy(),
                               rtol=0, atol=1e-6)

    with pytest.raises(ValueError, match="artifact"):
        evaluate(cfg, loader, out_dir=str(tmp_path), mode="test",
                 artifact=path, ct_int8=1)


def test_int8_serving_mode_exports(tmp_path):
    """scripts/test.py --ct_int8 1 --export_artifact: the quantized-trunk
    serving configuration freezes into an artifact (int8 weights + scales
    baked as constants) whose probs match the live int8 run."""
    from llmmil_tpu.data import BatchLoader, SyntheticCohort
    from llmmil_tpu.eval import evaluate

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", aggregator="TransMIL",
                 loss_point="CT-Pth-Last", spacing=[2.0, 2.0, 2.5],
                 compute_dtype="float32", ct_temporal_mode="dfold",
                 clip_vocab=64, clip_context=16, clip_width=32,
                 clip_heads=4, clip_layers=1, clip_embed=16,
                 ct_shape=[16, 32, 32], bag_buckets=[64],
                 mode="test", best_thres=0.5, batch_size=1)
    syn = SyntheticCohort(cfg, n_per_hospital=1, seed=13)
    loader = BatchLoader(syn.dataset(cfg, "test"), 1, prefetch=0)
    path = str(tmp_path / "int8.llmmil")

    res_live = evaluate(cfg, loader, out_dir=str(tmp_path / "live"),
                        mode="test", ct_int8=1, export_artifact=path)
    served = load_artifact(path)
    assert served.manifest["ct_int8"] == 1
    res_art = evaluate(cfg, loader, out_dir=str(tmp_path / "art"),
                       mode="test", artifact=path)
    np.testing.assert_allclose(res_art["table"]["prob"].to_numpy(),
                               res_live["table"]["prob"].to_numpy(),
                               rtol=0, atol=1e-6)


def test_exported_entry_runs_without_variables(tmp_path):
    """The artifact alone (no params in scope) must produce the outputs —
    i.e. the variables were truly baked in as constants."""
    cfg = _cfg()
    model = build_model(cfg)
    ex = {k: v for k, v in _batch(cfg, 1, 32).items() if k != "label"}
    variables = model.init(jax.random.PRNGKey(1), ex)
    want = np.asarray(jax.jit(
        lambda b: model.apply(variables, b, train=False)["probs"])(ex))
    blob = export_model(cfg, variables, [ex], platforms=("cpu",))
    del variables, model
    served = ServingModel(blob)
    np.testing.assert_array_equal(np.asarray(served.call(ex)), want)
