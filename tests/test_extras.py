"""Tests for inventory-completeness models: per-modality TransMIL, fusion
baselines, ResNeXt3D, 2-D ResNet, TwoWayTransformer2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.config import Config
import llmmil_tpu.models as M


def test_transmil_per_modality_shapes():
    m = M.TransMILPerModality(n_classes=2, L=16, D=32, n_ci=4, n_ct=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4 + 10 + 20, 16))
    mask = jnp.ones((2, 34), bool).at[:, 30:].set(False)
    params = m.init(jax.random.PRNGKey(1), x, mask)
    h, attns = m.apply(params, x, mask)
    assert h.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(h)))


def test_twoway2_shapes():
    tw = M.TwoWayTransformer2(depth=2, embedding_dim=16, num_heads=4,
                              mlp_dim=32)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 12, 16))
    pe = jax.random.normal(rng, (12, 16))
    pts = jax.random.normal(rng, (1, 3, 16))
    params = tw.init(rng, img, pe, pts)
    q, k = tw.apply(params, img, pe, pts)
    assert q.shape == (1, 3, 16) and k.shape == (1, 12, 16)


def _batch(cfg, b=2):
    rs = np.random.RandomState(0)
    batch = {}
    if "CT" in cfg.modality:
        batch["input_CT"] = jnp.array(rs.rand(b, 8, 32, 32, 1), jnp.float32)
    if "pathology" in cfg.modality:
        batch["input_pathology"] = jnp.array(rs.randn(b, 30, 768),
                                             jnp.float32)
        batch["mask_pathology"] = jnp.ones((b, 30), bool)
    batch["input_CI"] = jnp.array(rs.randn(b, 9), jnp.float32)
    return batch


def test_aggregator_clip_late_fusion():
    cfg = Config(modality=["CT", "pathology"], model_family="clip",
                 compute_dtype="float32", spacing=[2.0, 2.0, 2.5],
                 learnablePrompt=0)
    model = M.build_model(cfg)
    assert isinstance(model, M.AggregatorClip)
    batch = _batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out["probs"].shape == (2, 2)
    assert "feat_CT" in out and "feat_pathology" in out and "feat_CI" in out


def test_aggregator_concat_baseline():
    cfg = Config(modality=["CT", "pathology"], model_family="concat",
                 compute_dtype="float32", spacing=[2.0, 2.0, 2.5],
                 learnablePrompt=0)
    model = M.build_model(cfg)
    batch = _batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out["probs"].shape == (2, 2)


def test_resnext3d_and_finetune_labels():
    m = M.ResNeXt3D(depth=50, num_classes=2)
    x = jnp.ones((1, 8, 16, 16, 1))
    variables = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(variables, x, train=True,
                     mutable=["batch_stats"])
    assert out.shape == (1, 2)
    labels = M.finetune_param_labels(variables["params"], 3)
    assert labels["fc"]["kernel"] == "train"
    assert labels["layer1_0"]["conv1"]["conv"]["kernel"] == "frozen"
    assert labels["layer3_0"]["conv1"]["conv"]["kernel"] == "train"


def test_resnet18_2d():
    m = M.Resnet18_2D(num_classes=2, activation="softmax")
    x = jnp.ones((2, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)
