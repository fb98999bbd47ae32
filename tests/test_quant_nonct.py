"""int8 non-CT serving stack (eval/quant_nonct.py).

Invariants:
- the interceptor quantizes exactly the Dense sites above the size
  threshold (TwoWay q/k/v/out + MLPs, TransMIL qkv/fc, CLIP resblocks,
  fc_pathology) and leaves everything else float;
- int8 probs track the float probs within PTQ tolerance on the flagship
  config, and are finite;
- composes with the evaluate() driver (--nonct_int8): per-patient table
  close to the float run, artifact export bakes the int8 graph and
  serves identically to the live int8 path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from llmmil_tpu.config import Config
from llmmil_tpu.eval.quant_nonct import (MIN_ELEMS, _dense_sites,
                                         calibrate_nonct,
                                         intercepted_apply,
                                         nonct_int8_pack, quantize_nonct)
from llmmil_tpu.models import build_model


def _cfg(**kw):
    base = dict(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                model_pathology="TransMIL", model_CI="CLIP",
                CI_input_version="text", aggregator="TransMIL",
                loss_point="CT-Pth-Last", learnablePrompt=1,
                compute_dtype="float32", spacing=[2.0, 2.0, 2.5],
                ct_layers=[1, 1, 1, 1], clip_vocab=512, clip_context=24,
                clip_width=64, clip_heads=4, clip_layers=2, clip_embed=64,
                ct_remat="none")
    base.update(kw)
    return Config(**base)


def _batch(cfg, b=1, bag_n=64, seed=0):
    rs = np.random.RandomState(seed)
    toks = rs.randint(1, cfg.clip_vocab - 2,
                      (b, cfg.n_clinical + 1, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    return {
        "input_CT": jnp.asarray(rs.rand(b, 8, 16, 16, 1), jnp.float32),
        "input_pathology": jnp.asarray(rs.randn(b, bag_n, 768),
                                       jnp.float32),
        "mask_pathology": jnp.asarray(
            np.arange(bag_n)[None] < rs.randint(bag_n // 2, bag_n,
                                                (b, 1))),
        "input_CI": jnp.asarray(toks, jnp.int32),
    }


def test_site_selection_and_parity():
    cfg = _cfg()
    model = build_model(cfg)
    batch = _batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)

    # at the tiny clip width only the big fusion/MIL GEMMs clear the
    # default threshold — lower it so the clip resblocks quantize too
    min_elems = 64 * 64
    sites = _dense_sites(variables["params"], min_elems)
    names = "\n".join(sites)
    assert "TwoWayTransformer_Both" in names
    assert "aggregator" in names          # TransMIL qkv/fc sites
    assert "fc_pathology" in names
    assert "clinic_extractor" in names    # CLIP resblocks
    # heads stay float (num_classes output dim is tiny)
    assert not any(p.endswith("/fc") or p == "fc" for p in sites)

    want = model.apply(variables, batch, train=False)["probs"]

    scales = calibrate_nonct(model, variables, [batch],
                             min_elems=min_elems)
    assert set(scales) == set(sites)
    pack = quantize_nonct(variables, scales, min_elems=min_elems)
    hits = set()
    got = intercepted_apply(model, variables, batch, pack, hits=hits,
                            train=False)["probs"]
    assert hits == set(sites)             # every packed site engaged
    assert np.isfinite(np.asarray(got)).all()
    # PTQ tolerance: per-channel int8 weights + per-tensor activations
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.08)
    # ... and it is actually a different (quantized) program
    assert not np.array_equal(np.asarray(got), np.asarray(want))


def test_jitted_and_batch_shapes():
    cfg = _cfg()
    model = build_model(cfg)
    batch = _batch(cfg, b=2, bag_n=32, seed=1)
    variables = model.init(jax.random.PRNGKey(0), batch)
    pack = nonct_int8_pack(model, variables, [batch], min_elems=64 * 64)

    @jax.jit
    def f(v, b):
        return intercepted_apply(model, v, b, pack, train=False)["probs"]

    out = f(variables, batch)
    assert out.shape == (2, cfg.num_classes)
    assert np.isfinite(np.asarray(out)).all()


def test_evaluate_driver_nonct_int8(tmp_path):
    from llmmil_tpu.data.pipeline import BatchLoader, SyntheticCohort
    from llmmil_tpu.eval import evaluate

    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 CI_input_version="v1", loss_point="Last",
                 learnablePrompt=0, compute_dtype="float32",
                 augmentation=0, bag_buckets=[256])
    # one bag bucket -> one export signature (the artifact check below
    # serves every patient through the single exported entry)
    syn = SyntheticCohort(cfg, n_per_hospital=3, bag_range=(100, 250),
                          seed=0)

    rf = evaluate(cfg, BatchLoader(syn.dataset(cfg, "test"), 1),
                  out_dir=str(tmp_path / "float"), mode="test")
    rq = evaluate(cfg, BatchLoader(syn.dataset(cfg, "test"), 1),
                  out_dir=str(tmp_path / "int8"), mode="test",
                  nonct_int8=True,
                  export_artifact=str(tmp_path / "model.llmmil"))

    tf_ = rf["table"].sort_values("ID").reset_index(drop=True)
    tq = rq["table"].sort_values("ID").reset_index(drop=True)
    assert list(tf_["ID"]) == list(tq["ID"])
    # untrained random weights amplify PTQ noise (gated attention over
    # 100-250 random instances); trained models sit far inside this
    assert np.isfinite(tq["prob"].to_numpy()).all()
    np.testing.assert_allclose(tq["prob"].to_numpy(),
                               tf_["prob"].to_numpy(), atol=0.15)

    # the exported artifact carries the int8 graph and matches the live
    # int8 serving path
    from llmmil_tpu.eval.export import load_artifact
    served = load_artifact(str(tmp_path / "model.llmmil"))
    assert served.manifest["nonct_int8"] is True
    ra = evaluate(cfg, BatchLoader(syn.dataset(cfg, "test"), 1),
                  out_dir=str(tmp_path / "art"), mode="test",
                  artifact=str(tmp_path / "model.llmmil"))
    ta = ra["table"].sort_values("ID").reset_index(drop=True)
    np.testing.assert_allclose(ta["prob"].to_numpy(),
                               tq["prob"].to_numpy(), atol=1e-5)
