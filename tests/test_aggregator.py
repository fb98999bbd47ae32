"""Flagship Aggregator smoke tests across modality combinations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.models import build_model

TINY_CLIP = dict(clip_vocab=64, clip_context=16, clip_width=32,
                 clip_heads=4, clip_layers=1, clip_embed=16)


def _batch_for(cfg, rng=0):
    rs = np.random.RandomState(rng)
    b = 2
    batch = {}
    if "CT" in cfg.modality:
        batch["input_CT"] = jnp.array(
            rs.rand(b, 8, 32, 32, 1).astype(np.float32))
    if "pathology" in cfg.modality:
        batch["input_pathology"] = jnp.array(
            rs.randn(b, 40, 768).astype(np.float32))
        batch["mask_pathology"] = jnp.array(
            np.arange(40)[None] < np.array([[30], [40]]))
    if cfg.CI_input_version == "text":
        toks = rs.randint(1, cfg.clip_vocab - 1,
                          (b, cfg.n_clinical + 1, cfg.clip_context))
        toks[..., -1] = cfg.clip_vocab - 1
        batch["input_CI"] = jnp.array(toks.astype(np.int32))
    else:
        batch["input_CI"] = jnp.array(
            rs.randn(b, cfg.n_clinical).astype(np.float32))
    return batch


def _run(cfg):
    model = build_model(cfg)
    batch = _batch_for(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model.apply(params, batch), params


def test_pathology_only_abmil():
    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 compute_dtype="float32", loss_point="Last")
    out, _ = _run(cfg)
    assert out["probs"].shape == (2, 2)
    assert np.all((np.asarray(out["probs"]) >= 0)
                  & (np.asarray(out["probs"]) <= 1))
    assert out["emb_Pth2CI"].shape[0] == 2


def test_ci_only():
    cfg = Config(modality=["CI"], model_CI="simpleFCs_v1",
                 compute_dtype="float32", aggregator="-", loss_point="Last")
    out, _ = _run(cfg)
    assert out["probs"].shape[0] == 2


def test_ct_only_mc3():
    cfg = Config(modality=["CT"], model_CT="resnetMC3_18",
                 model_CI="simpleFCs_v1", aggregator="ABMIL",
                 compute_dtype="float32", loss_point="Last",
                 spacing=[2.0, 2.0, 2.5])
    out, _ = _run(cfg)
    assert out["probs"].shape == (2, 2)
    assert "emb_CT2CI" in out


def test_trimodal_clip_transmil_three_heads():
    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", aggregator="TransMIL",
                 loss_point="CT-Pth-Last", compute_dtype="float32",
                 spacing=[2.0, 2.0, 2.5], n_ctx=4, **TINY_CLIP)
    out, params = _run(cfg)
    for key in ("probs", "probs_CT", "probs_Pth"):
        assert out[key].shape == (2, 2), key
    assert "emb_CT2CI" in out and "emb_Pth2CI" in out

    # gradients flow end-to-end through all three heads
    model = build_model(cfg)
    batch = _batch_for(cfg)

    def loss(p):
        o = model.apply(p, batch)
        return sum(jnp.sum(o[k]) for k in ("probs", "probs_CT", "probs_Pth"))

    g = jax.grad(lambda p: loss(p))(params)
    ctx_g = np.abs(np.asarray(
        g["params"]["clinic_extractor"]["ctx"])).sum()
    assert ctx_g > 0


def test_trimodal_separate_ci_encoders():
    """aggregator_tmp variant: two clinical encoders + per-modality
    TwoWayTransformers + CI2CT/CI2Pth outputs."""
    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="ABMIL", model_CI="simpleFCs_v1",
                 aggregator="ABMIL", loss_point="Last",
                 compute_dtype="float32", spacing=[2.0, 2.0, 2.5],
                 separate_CI_encoders=1)
    out, params = _run(cfg)
    assert out["probs"].shape == (2, 2)
    assert "emb_CI2CT" in out and "emb_CI2Pth" in out
    p = params["params"]
    assert "clinic_extractor_CT" in p and "clinic_extractor_Pth" in p
    assert "TwoWayTransformer_CT" in p and "TwoWayTransformer_Pth" in p


def test_trimodal_transmil_seperate():
    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="ABMIL", model_CI="simpleFCs_v1",
                 aggregator="TransMIL_seperate", loss_point="Last",
                 compute_dtype="float32", spacing=[2.0, 2.0, 2.5])
    out, _ = _run(cfg)
    assert out["probs"].shape == (2, 2)
