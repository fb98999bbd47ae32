"""Saliency / Grad-CAM smoke tests (CT-only tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp

from llmmil_tpu.config import Config
from llmmil_tpu.eval import grad_cam, saliency_map
from llmmil_tpu.models import build_model


def _setup():
    cfg = Config(modality=["CT"], model_CT="resnetMC3_18",
                 model_CI="simpleFCs_v1", aggregator="ABMIL",
                 loss_point="Last", compute_dtype="float32",
                 spacing=[2.0, 2.0, 2.5], learnablePrompt=0)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    batch = {"input_CT": jnp.array(rs.rand(1, 8, 32, 32, 1), jnp.float32),
             "input_CI": jnp.array(rs.randn(1, 9), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    return cfg, variables, batch


def test_saliency_map():
    cfg, variables, batch = _setup()
    s = saliency_map(cfg, variables, batch)
    assert s.shape == batch["input_CT"].shape
    assert np.all(s >= 0) and s.max() > 0


def test_grad_cam():
    cfg, variables, batch = _setup()
    cam = grad_cam(cfg, variables, batch)
    assert cam.ndim == 4 and cam.shape[0] == 1
    assert np.all(cam >= 0)
    assert np.all(np.isfinite(cam))


def _pth_setup(aggregator="TransMIL", n=12, valid=8):
    cfg = Config(modality=["pathology"], model_CI="simpleFCs_v1",
                 aggregator=aggregator, loss_point="Last",
                 compute_dtype="float32", learnablePrompt=0)
    model = build_model(cfg)
    rs = np.random.RandomState(1)
    mask = np.arange(n)[None] < valid
    batch = {"input_pathology": jnp.array(rs.randn(1, n, 768), jnp.float32),
             "mask_pathology": jnp.array(mask),
             "input_CI": jnp.array(rs.randn(1, 9), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    return cfg, variables, batch, mask


def test_pathology_attention_transmil():
    from llmmil_tpu.eval import pathology_attention
    cfg, variables, batch, mask = _pth_setup("TransMIL")
    w = pathology_attention(cfg, variables, batch)
    n = batch["input_pathology"].shape[1]
    assert w.shape == (1, n)
    assert np.all(w[~mask] == 0), "masked instances must carry 0 weight"
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
    assert np.all(np.isfinite(w))
    # garbage in the masked rows must not perturb the valid weights
    bag = np.asarray(batch["input_pathology"]).copy()
    bag[0, mask[0] == False, :] = 1e3          # noqa: E712
    w2 = pathology_attention(cfg, variables,
                             dict(batch, input_pathology=jnp.array(bag)))
    np.testing.assert_allclose(w2, w, atol=1e-6)


def test_pathology_attention_abmil():
    from llmmil_tpu.eval import pathology_attention
    cfg, variables, batch, mask = _pth_setup("ABMIL")
    w = pathology_attention(cfg, variables, batch)
    assert w.shape == (1, batch["input_pathology"].shape[1])
    assert np.all(w[~mask] == 0)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)


def test_save_patient_maps_writes_files(tmp_path):
    from llmmil_tpu.data import BatchLoader, SyntheticCohort
    from llmmil_tpu.eval import save_patient_maps
    from llmmil_tpu.train.state import create_train_state

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="simpleFCs_v1",
                 aggregator="TransMIL", loss_point="Last",
                 compute_dtype="float32", spacing=[2.0, 2.0, 2.5],
                 ct_hw_override=96, ct_shape=[16, 96, 96],
                 bag_buckets=[32], learnablePrompt=0,
                 map_type="all", num_workers=0)
    syn = SyntheticCohort(cfg, n_per_hospital=2, ct_shape=(16, 96, 96),
                          bag_range=(8, 20), seed=0)
    ds = syn.dataset(cfg, "test")
    loader = BatchLoader(ds, 1, shuffle=False, prefetch=0)
    first = loader.first_batch()
    cfg = cfg.replace(watch_ID=first["ID"][0])
    model = build_model(cfg)
    state = create_train_state(
        model, cfg, {k: v for k, v in first.items() if k != "ID"},
        jax.random.PRNGKey(0))
    written = save_patient_maps(cfg, state, loader, str(tmp_path))
    assert set(written) == {"saliencyMap", "gradCAM", "pathologyAttn"}
    for kind, path in written.items():
        arr = np.load(path)
        assert np.all(np.isfinite(arr)), kind
