"""int8 serving quantization for the non-flagship CT trunks
(llmmil_tpu/eval/quant_zoo.py + the cfg-dispatch in eval/quant.py).

Same contract as tests/test_quant.py: each float runner is the parity
anchor against its flax module, the int8 path stays close to float on
random nets, calibration exposes every conv site, and the eval driver's
``ct_int8`` mode works for every supported ``model_CT``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.eval.quant import (calibrate_ct_trunk, quantize_ct_trunk,
                                   run_trunk_int8)
from llmmil_tpu.eval.quant_zoo import (run_mednet_trunk, run_r2p1d_trunk,
                                       _sites_mednet, _sites_r2p1d)
from llmmil_tpu.models.ct_mc3 import MedicalNetFeatures
from llmmil_tpu.models.ct_r2plus1d import Resnet2plus1D_18

R2P1D_SITES = (["stem_t"]
               + [f"layer{i}_{b}/conv{c}/{part}"
                  for i in (1, 2, 3, 4) for b in (0, 1) for c in (1, 2)
                  for part in ("spatial", "temporal")]
               + [f"layer{i}_0/downsample" for i in (2, 3, 4)])
MEDNET_SITES = ([f"layer1_{b}/conv{c}" for b in (0, 1, 2) for c in (1, 2, 3)]
                + [f"layer2_{b}/conv{c}" for b in (0, 1, 2, 3)
                   for c in (1, 2, 3)]
                + ["layer1_0/downsample", "layer2_0/downsample"])


def _setup_r2p1d(seed=0):
    cfg = Config(modality=["CT"], model_CT="resnet2plus1d_18")
    model = Resnet2plus1D_18(remat=False)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((1, 6, 16, 16, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    return cfg, model, variables, x


def _setup_mednet(seed=0):
    cfg = Config(modality=["CT"], model_CT="medicalNet")
    model = MedicalNetFeatures()
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((1, 8, 16, 16, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    return cfg, model, variables, x


@pytest.mark.parametrize("which", ["r2p1d", "mednet"])
def test_float_runner_matches_flax(which):
    if which == "r2p1d":
        cfg, model, variables, x = _setup_r2p1d()
        got = run_r2p1d_trunk(cfg, variables, x)
    else:
        cfg, model, variables, x = _setup_mednet()
        got = run_mednet_trunk(cfg, variables, x)
    want = model.apply(variables, x, train=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("which,sites", [("r2p1d", R2P1D_SITES),
                                         ("mednet", MEDNET_SITES)])
def test_calibration_covers_every_site(which, sites):
    cfg, _, variables, x = (_setup_r2p1d() if which == "r2p1d"
                            else _setup_mednet())
    scales = calibrate_ct_trunk(cfg, variables, [x])
    assert sorted(scales) == sorted(sites)
    assert all(float(v) > 0 for v in scales.values())
    sites_fn = _sites_r2p1d if which == "r2p1d" else _sites_mednet
    assert sorted(n for n, _ in sites_fn(variables["params"])) \
        == sorted(sites)


@pytest.mark.parametrize("which", ["r2p1d", "mednet"])
def test_int8_close_to_float(which):
    if which == "r2p1d":
        cfg, _, variables, x = _setup_r2p1d()
        runner = run_r2p1d_trunk
    else:
        cfg, _, variables, x = _setup_mednet()
        runner = run_mednet_trunk
    scales = calibrate_ct_trunk(cfg, variables, [x])
    qpack = quantize_ct_trunk(cfg, variables, scales)
    ref = np.asarray(runner(cfg, variables, x)).ravel()
    got = np.asarray(run_trunk_int8(cfg, qpack, x)).ravel()
    assert np.all(np.isfinite(got))
    cos = float(np.dot(ref, got)
                / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    rel = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12))
    assert cos > 0.98, f"cosine {cos}"
    assert rel < 0.2, f"rel {rel}"
    # int8 weights really are int8, one scale per cout
    kq, sw = next(iter(qpack["kq"].values()))
    assert kq.dtype == jnp.int8 and sw.ndim == 1


def test_unsupported_model_ct_raises():
    cfg = Config(modality=["CT"], model_CT="MViT")
    with pytest.raises(ValueError, match="ct_int8"):
        calibrate_ct_trunk(cfg, {"params": {}, "batch_stats": {}}, [])


def test_evaluate_int8_r2p1d_close_to_float(tmp_path):
    """The eval driver's ct_int8 mode dispatches to the zoo runner."""
    from llmmil_tpu.data import BatchLoader, SyntheticCohort
    from llmmil_tpu.eval import evaluate

    cfg = Config(modality=["CT", "pathology"],
                 model_CT="resnet2plus1d_18", model_pathology="TransMIL",
                 model_CI="CLIP", CI_input_version="text",
                 aggregator="TransMIL", loss_point="CT-Pth-Last",
                 spacing=[2.0, 2.0, 2.5], compute_dtype="float32",
                 clip_vocab=64, clip_context=16, clip_width=32,
                 clip_heads=4, clip_layers=1, clip_embed=16,
                 ct_shape=[16, 32, 32], bag_buckets=[64],
                 mode="test", best_thres=0.5, batch_size=1)
    syn = SyntheticCohort(cfg, n_per_hospital=1, seed=13)
    loader = BatchLoader(syn.dataset(cfg, "test"), 1, prefetch=0)
    res0 = evaluate(cfg, loader, out_dir=str(tmp_path / "f"), mode="test")
    res8 = evaluate(cfg, loader, out_dir=str(tmp_path / "q"), mode="test",
                    ct_int8=1)
    assert list(res0["table"]["ID"]) == list(res8["table"]["ID"])
    p0 = res0["table"]["prob"].to_numpy()
    p8 = res8["table"]["prob"].to_numpy()
    assert np.all(np.isfinite(p8))
    np.testing.assert_allclose(p8, p0, atol=0.05)


def test_evaluate_int8_wmask_concat_channel(tmp_path):
    """wMask flagship (twoway family): the int8 runner must see the
    mask-concatenated 2-channel volume (the stem kernel has cin=2)."""
    from llmmil_tpu.data import BatchLoader, SyntheticCohort
    from llmmil_tpu.eval import evaluate

    cfg = Config(modality=["CT", "pathology"],
                 model_CT="resnetMC3_18_wMask", wmask_family="twoway",
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
    res0 = evaluate(cfg, loader, out_dir=str(tmp_path / "f"), mode="test")
    res8 = evaluate(cfg, loader, out_dir=str(tmp_path / "q"), mode="test",
                    ct_int8=1)
    p0 = res0["table"]["prob"].to_numpy()
    p8 = res8["table"]["prob"].to_numpy()
    assert np.all(np.isfinite(p8))
    np.testing.assert_allclose(p8, p0, atol=0.05)


def test_evaluate_int8_rejects_baseline_families(tmp_path):
    from llmmil_tpu.data import BatchLoader, SyntheticCohort
    from llmmil_tpu.eval import evaluate

    cfg = Config(modality=["CT"], model_CT="resnetMC3_18",
                 model_family="clip", CI_input_version="v1",
                 model_CI="simpleFCs_v1", spacing=[2.0, 2.0, 2.5],
                 ct_shape=[16, 32, 32], mode="test", best_thres=0.5,
                 batch_size=1)
    syn = SyntheticCohort(cfg, n_per_hospital=1, seed=13)
    loader = BatchLoader(syn.dataset(cfg, "test"), 1, prefetch=0)
    with pytest.raises(ValueError, match="ct_features"):
        evaluate(cfg, loader, out_dir=str(tmp_path), mode="test",
                 ct_int8=1)
