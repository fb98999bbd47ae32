"""Tests for the concat aggregator_wMask architecture and alignment_base.

Parity targets: ``model/aggregator_wMask.py:38-114`` (concat fusion, 2-layer
Dropout/Linear/ReLU head, single sigmoid output), ``model/utils.py:7-9``
(wMask dispatch), ``model/sam/transformer.py:78-98`` (alignment_base picks
the query side of the TwoWayTransformer).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.models import Aggregator, AggregatorWMask, build_model


def _wmask_cfg(**kw):
    base = dict(modality=["CT", "pathology", "CI"],
                model_CT="resnetMC3_18_wMask", model_pathology="ABMIL",
                model_CI="simpleFCs_v1", CI_input_version="v1",
                aggregator="ABMIL", loss_point="Last", learnablePrompt=0,
                compute_dtype="float32", spacing=[2.0, 2.0, 2.5])
    base.update(kw)
    return Config(**base)


def _wmask_batch(rs, b=1, ct=(8, 32, 32), bag=48):
    mask = np.zeros((b, *ct, 1), np.float32)
    mask[:, 2:5, 10:20, 10:20] = 1.0
    return {
        "input_CT": jnp.asarray(rs.rand(b, *ct, 1), jnp.float32),
        "mask_CT": jnp.asarray(mask),
        "input_pathology": jnp.asarray(rs.randn(b, bag, 768), jnp.float32),
        "mask_pathology": jnp.asarray(np.arange(bag)[None] < bag - 5),
        "input_CI": jnp.asarray(rs.randn(b, 9), jnp.float32),
    }


def test_wmask_dispatch_is_concat_model():
    """get_model routes 'wMask' in model_CT to the concat model
    (model/utils.py:7-9); the TwoWay flagship stays reachable by flag."""
    assert isinstance(build_model(_wmask_cfg()), AggregatorWMask)
    assert isinstance(build_model(_wmask_cfg(wmask_family="twoway")),
                      Aggregator)
    assert isinstance(build_model(_wmask_cfg(model_CT="resnetMC3_18")),
                      Aggregator)


def test_wmask_trimodal_shapes_and_head_widths():
    cfg = _wmask_cfg()
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    batch = _wmask_batch(rs)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert set(out) == {"probs"}        # single head (aggregator_wMask.py:114)
    assert out["probs"].shape == (1, 2)
    assert np.all(np.isfinite(np.asarray(out["probs"])))
    p = variables["params"]
    # hidden = 192·(CT) + 192·(pathology) (aggregator_wMask.py:40-46);
    # input = 512 (mean-pooled layer4) + 768 (gated attention) + 512 (simpleFCs)
    assert p["fc_hidden"]["kernel"].shape == (512 + 768 + 512, 384)
    assert p["fc_out"]["kernel"].shape == (384, 2)
    # CT trunk consumed image+mask as 2 input channels (aggregator_wMask.py:79)
    stem = jax.tree_util.tree_leaves_with_path(p["extractor_CT"])
    assert any(l.shape[-2] == 2 for _, l in stem if l.ndim >= 4)


def test_wmask_head_numerics_vs_manual():
    """Eval-mode probs equal the 2-layer head recomputed from the params
    (dropout is identity at eval): sigmoid(W2·relu(W1·x)+b2)."""
    cfg = _wmask_cfg(modality=["pathology", "CI"])
    model = build_model(cfg)
    rs = np.random.RandomState(1)
    batch = {k: v for k, v in _wmask_batch(rs).items()
             if "CT" not in k}
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(variables, batch)["probs"])

    p = variables["params"]
    from llmmil_tpu.ops.mil import gated_attention_pool
    ab = p["extractor_pathology"]
    pooled, _ = gated_attention_pool(
        batch["input_pathology"], ab["V_kernel"], ab["V_bias"],
        ab["U_kernel"], ab["U_bias"], ab["w_kernel"], ab["w_bias"],
        mask=batch["mask_pathology"])
    ci = batch["input_CI"]
    fcs = p["extractor_CI"]
    ci = jax.nn.relu(ci @ fcs["fc0"]["kernel"] + fcs["fc0"]["bias"])
    ci = jax.nn.relu(ci @ fcs["fc1"]["kernel"] + fcs["fc1"]["bias"])
    x = jnp.concatenate([pooled[:, 0], ci], axis=-1)
    h = jax.nn.relu(x @ p["fc_hidden"]["kernel"] + p["fc_hidden"]["bias"])
    want = jax.nn.sigmoid(h @ p["fc_out"]["kernel"] + p["fc_out"]["bias"])
    np.testing.assert_allclose(out, np.asarray(want), rtol=2e-5, atol=2e-6)


def test_wmask_ci_only_single_layer():
    cfg = _wmask_cfg(modality=["CI"])
    model = build_model(cfg)
    batch = {"input_CI": jnp.asarray(
        np.random.RandomState(0).randn(2, 9), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out["probs"].shape == (2, 2)
    p = variables["params"]
    assert "fc_hidden" not in p         # aggregator_wMask.py:51-55
    assert p["fc_out"]["kernel"].shape == (512, 2)


# ---- alignment_base --------------------------------------------------------

def _pth_cfg(**kw):
    base = dict(modality=["pathology"], model_pathology="ABMIL",
                model_CI="simpleFCs_v1", CI_input_version="v1",
                aggregator="ABMIL", loss_point="Last", learnablePrompt=0,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


def _pth_batch(rs, b=2, bag=24):
    return {
        "input_pathology": jnp.asarray(rs.randn(b, bag, 768), jnp.float32),
        "mask_pathology": jnp.asarray(np.arange(bag)[None] < bag - 3),
        "input_CI": jnp.asarray(rs.randn(b, 9), jnp.float32),
    }


def test_alignment_base_swaps_query_side():
    """alignment_base='pathology' makes the bag tokens the query side:
    emb_Pth2CI (the query-side output, transformer.py:101-120) carries
    bag-many tokens instead of the CI prompt's one."""
    rs = np.random.RandomState(0)
    batch = _pth_batch(rs)
    out = {}
    for ab in ("CI", "pathology"):
        model = build_model(_pth_cfg(alignment_base=ab))
        variables = model.init(jax.random.PRNGKey(0), batch)
        out[ab] = model.apply(variables, batch)
    assert out["CI"]["emb_Pth2CI"].shape == (2, 1, 512)
    assert out["pathology"]["emb_Pth2CI"].shape == (2, 24, 512)
    for o in out.values():
        assert np.all(np.isfinite(np.asarray(o["probs"])))


def test_alignment_base_ct_swaps_query_side():
    cfg = Config(modality=["CT"], model_CT="resnetMC3_18",
                 model_CI="simpleFCs_v1", CI_input_version="v1",
                 aggregator="ABMIL", loss_point="Last", learnablePrompt=0,
                 compute_dtype="float32", spacing=[2.0, 2.0, 2.5],
                 alignment_base="CT")
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    batch = {"input_CT": jnp.asarray(rs.rand(1, 8, 32, 32, 1), jnp.float32),
             "input_CI": jnp.asarray(rs.randn(1, 9), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    # CT layer4 map has T=8 slice tokens (spacing 2.0 → stride (1,1,1) stem)
    assert out["emb_CT2CI"].shape == (1, 8, 512)


def test_alignment_base_rejected_loudly():
    rs = np.random.RandomState(0)
    batch = _pth_batch(rs)
    with pytest.raises(ValueError, match="alignment_base"):
        model = build_model(_pth_cfg(alignment_base="bogus"))
        model.init(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="without CT"):
        model = build_model(_pth_cfg(alignment_base="CT"))
        model.init(jax.random.PRNGKey(0), batch)
