"""int8 CT-trunk serving quantization (llmmil_tpu/eval/quant.py).

The float path of run_trunk is the parity anchor against the flax
ResnetMC3_18; the int8 path must stay close to float on random nets
(quantization error only) and expose every conv site to calibration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.eval.quant import (calibrate_ct_trunk, int8_ct_features,
                                   quantize_ct_trunk, run_trunk,
                                   run_trunk_int8)
from llmmil_tpu.models.ct_mc3 import ResnetMC3_18

SITES = (["layer1_%d/conv%d" % (b, c) for b in (0, 1) for c in (1, 2)]
         + ["layer%d_%d/conv%d" % (s, b, c)
            for s in (2, 3, 4) for b in (0, 1) for c in (1, 2)]
         + ["layer%d_0/downsample" % s for s in (2, 3, 4)])


def _setup(spacing=0.6869, seed=0):
    cfg = Config(modality=["CT"], spacing=[spacing, spacing, 3.0])
    model = ResnetMC3_18(spacing_xy=spacing, remat=False,
                        temporal_mode="dfold")
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((1, 8, 16, 16, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    return cfg, model, variables, x


@pytest.mark.parametrize("spacing", [0.6869, 2.0])
def test_float_runner_matches_flax_trunk(spacing):
    cfg, model, variables, x = _setup(spacing)
    want = model.apply(variables, x, train=False)
    got = run_trunk(cfg, variables, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_calibration_covers_every_site():
    cfg, _, variables, x = _setup()
    scales = calibrate_ct_trunk(cfg, variables, [x])
    assert sorted(scales) == sorted(SITES)
    assert all(float(v) > 0 for v in scales.values())


def test_int8_close_to_float():
    cfg, _, variables, x = _setup()
    scales = calibrate_ct_trunk(cfg, variables, [x])
    qpack = quantize_ct_trunk(cfg, variables, scales)
    ref = np.asarray(run_trunk(cfg, variables, x)).ravel()
    got = np.asarray(run_trunk_int8(cfg, qpack, x)).ravel()
    assert np.all(np.isfinite(got))
    cos = float(np.dot(ref, got)
                / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    rel = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12))
    assert cos > 0.98, f"cosine {cos}"
    assert rel < 0.2, f"rel {rel}"


def test_int8_deterministic_and_jittable():
    cfg, _, variables, x = _setup()
    fn, qpack = int8_ct_features(cfg, variables, [x], dtype=jnp.float32)
    a, b = fn(x), fn(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # int8 weights really are int8
    kq, sw = qpack["kq"]["layer1_0/conv1"]
    assert kq.dtype == jnp.int8 and sw.shape == (64,)


def test_flagship_subtree_naming():
    """Variables nested under extractor_CT (the flagship layout) are
    unwrapped by the same helper the depth-sharded path uses."""
    cfg, _, variables, x = _setup()
    nested = {c: {"extractor_CT": t} for c, t in variables.items()}
    want = run_trunk(cfg, variables, x)
    scales = calibrate_ct_trunk(cfg, nested, [x])
    qpack = quantize_ct_trunk(cfg, nested, scales)
    got = run_trunk_int8(cfg, qpack, x)
    ref = np.asarray(want).ravel()
    g = np.asarray(got).ravel()
    cos = float(np.dot(ref, g)
                / (np.linalg.norm(ref) * np.linalg.norm(g) + 1e-12))
    assert cos > 0.98
