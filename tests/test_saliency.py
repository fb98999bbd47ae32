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
