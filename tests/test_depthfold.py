"""DepthFoldedConv must be numerically identical to the native 3-D conv.

The depth-folded lowering (models/ct_mc3.py::DepthFoldedConv) exists purely
for TPU performance (3-D conv *gradients* run at ~8% MFU on v5e — the r2
profile's entire train-step gap); it must not change numerics or the
parameter tree, so checkpoints / the torch importer are mode-agnostic.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmmil_tpu.models.ct_mc3 import DepthFoldedConv, ResnetMC3_18


def _native_conv3d(x, k, stride, padding):
    return jax.lax.conv_general_dilated(
        x, k, stride, tuple((p, p) for p in padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


CASES = [
    # (kernel, stride, padding)  — the shapes the MC3 trunk actually uses
    ((3, 7, 7), (1, 2, 2), (1, 3, 3)),   # stem
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),   # layer1 blocks
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # (r3d-style strided temporal)
    ((3, 4, 4), (1, 2, 2), (1, 1, 1)),   # spacing stem
]


@pytest.mark.parametrize("mode", ["dfold", "dsum", "dshift"])
@pytest.mark.parametrize("kernel,stride,padding", CASES)
def test_depthfold_matches_native(mode, kernel, stride, padding):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 12, 12, 3)), jnp.float32)
    mod = DepthFoldedConv(4, kernel, stride, padding, mode=mode)
    params = mod.init(jax.random.PRNGKey(1), x)
    got = mod.apply(params, x)
    ref = _native_conv3d(x, params["params"]["kernel"], stride, padding)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["dfold", "dsum", "dshift"])
def test_depthfold_gradients_match_native(mode):
    kernel, stride, padding = (3, 3, 3), (1, 1, 1), (1, 1, 1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 8, 2)), jnp.float32)
    mod = DepthFoldedConv(3, kernel, stride, padding, mode=mode)
    params = mod.init(jax.random.PRNGKey(3), x)

    def loss_fold(p, xx):
        return jnp.sum(mod.apply(p, xx) ** 2)

    def loss_ref(k, xx):
        return jnp.sum(_native_conv3d(xx, k, stride, padding) ** 2)

    gp, gx = jax.grad(loss_fold, argnums=(0, 1))(params, x)
    rk, rx = jax.grad(loss_ref, argnums=(0, 1))(
        params["params"]["kernel"], x)
    np.testing.assert_allclose(np.asarray(gp["params"]["kernel"]),
                               np.asarray(rk), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kernel,stride,padding", CASES)
def test_conv3d_fwd_lowering_matches_native(kernel, stride, padding):
    """fwd_lowering='conv3d' (hybrid: 3-D fwd emitter + dfold grads via
    custom_vjp) must match the native conv exactly — cin >= 8 engages the
    hybrid; low-channel inputs silently keep the fold form."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 9, 12, 12, 8)), jnp.float32)
    mod = DepthFoldedConv(4, kernel, stride, padding, mode="dfold",
                          fwd_lowering="conv3d")
    params = mod.init(jax.random.PRNGKey(1), x)
    got = mod.apply(params, x)
    ref = _native_conv3d(x, params["params"]["kernel"], stride, padding)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_fwd_lowering_grads_are_the_fold_grads():
    """The hybrid's backward must be the dfold backward: same ops
    (linear_transpose of the fold graph), so gradients match the plain
    dfold mode to float-roundoff AND the native conv to test tolerance."""
    kernel, stride, padding = (3, 3, 3), (1, 1, 1), (1, 1, 1)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 8, 8)), jnp.float32)
    hyb = DepthFoldedConv(8, kernel, stride, padding, mode="dfold",
                          fwd_lowering="conv3d")
    fold = DepthFoldedConv(8, kernel, stride, padding, mode="dfold")
    params = hyb.init(jax.random.PRNGKey(9), x)

    def loss(m, p, xx):
        return jnp.sum(m.apply(p, xx) ** 2)

    gp_h, gx_h = jax.grad(loss, argnums=(1, 2))(hyb, params, x)
    gp_f, gx_f = jax.grad(loss, argnums=(1, 2))(fold, params, x)
    # same backward graph; the residual diff is the fp32-roundoff fwd
    # delta propagating through the cotangent 2y
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_f),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gp_h["params"]["kernel"]),
        np.asarray(gp_f["params"]["kernel"]), rtol=1e-4, atol=1e-4)

    def loss_ref(k, xx):
        return jnp.sum(_native_conv3d(xx, k, stride, padding) ** 2)

    rk, rx = jax.grad(loss_ref, argnums=(0, 1))(
        params["params"]["kernel"], x)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_h["params"]["kernel"]),
                               np.asarray(rk), rtol=1e-4, atol=1e-4)


def test_mc3_conv3d_fwd_lowering_same_params_same_output():
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 1)), jnp.float32)
    base = ResnetMC3_18(remat=False)
    hyb = ResnetMC3_18(remat=False, temporal_mode="dfold",
                       fwd_lowering="conv3d")
    variables = base.init(jax.random.PRNGKey(5), x)
    v2 = hyb.init(jax.random.PRNGKey(5), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    np.testing.assert_allclose(np.asarray(hyb.apply(variables, x)),
                               np.asarray(base.apply(variables, x)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["dfold", "dsum", "dshift"])
def test_mc3_temporal_mode_same_params_same_output(mode):
    """Same param tree, same numerics: a conv3d-trained checkpoint must be
    loadable and equivalent under any temporal_mode."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 1)), jnp.float32)
    base = ResnetMC3_18(remat=False)
    folded = ResnetMC3_18(remat=False, temporal_mode=mode)
    variables = base.init(jax.random.PRNGKey(5), x)
    v2 = folded.init(jax.random.PRNGKey(5), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    got = folded.apply(variables, x)
    ref = base.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["dfold", "dsum", "dshift"])
def test_r2plus1d_temporal_mode_same_params_same_output(mode):
    """R(2+1)D's (3,1,1) temporal convs as depth-tap GEMMs: identical
    param tree + numerics (fwd AND grads) vs the native 3-D conv path,
    covering the stride-2 temporal convs of layers 2-4."""
    from llmmil_tpu.models.ct_r2plus1d import Resnet2plus1D_18

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 1)), jnp.float32)
    base = Resnet2plus1D_18(remat=False, temporal_mode="conv3d")
    folded = Resnet2plus1D_18(remat=False, temporal_mode=mode)
    variables = base.init(jax.random.PRNGKey(5), x)
    v2 = folded.init(jax.random.PRNGKey(5), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    def loss(m):
        def f(params):
            y = m.apply({"params": params,
                         "batch_stats": variables["batch_stats"]}, x)
            return jnp.sum(y * y)
        return f

    ref_l, ref_g = jax.value_and_grad(loss(base))(variables["params"])
    got_l, got_g = jax.value_and_grad(loss(folded))(variables["params"])
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=2e-4)
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(got_g)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=str(pa))


def test_r2plus1d_auto_mode_train_eval_parity():
    """temporal_mode='auto' (the default) lowers train on the all-fold
    form and eval on the native 3-D emitter over ONE param tree — both
    programs must match the native lowering exactly (fwd + grads in train
    mode, fwd in eval mode)."""
    from llmmil_tpu.models.ct_r2plus1d import Resnet2plus1D_18

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 1)), jnp.float32)
    base = Resnet2plus1D_18(remat=False, temporal_mode="conv3d")
    auto = Resnet2plus1D_18(remat=False)          # default: 'auto'
    variables = base.init(jax.random.PRNGKey(5), x)
    v2 = auto.init(jax.random.PRNGKey(5), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    # eval program: auto == native conv3d
    np.testing.assert_allclose(
        np.asarray(auto.apply(variables, x)),
        np.asarray(base.apply(variables, x)), rtol=2e-4, atol=2e-4)

    # train program: auto takes the fold lowering — loss + grads match
    def loss(m):
        def f(params):
            y, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y * y)
        return f

    ref_l, ref_g = jax.value_and_grad(loss(base))(variables["params"])
    got_l, got_g = jax.value_and_grad(loss(auto))(variables["params"])
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=2e-4)
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(got_g)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=str(pa))


@pytest.mark.parametrize("mode", ["dfold", "dshift"])
def test_medicalnet_temporal_mode_same_params_same_output(mode):
    """MedicalNet's (7,7,7) stem + (3,3,3) bottleneck convs as depth-tap
    2-D forms: identical param tree + numerics (fwd and grads, stride-2
    layer2 included) vs the native 3-D emitters."""
    from llmmil_tpu.models.ct_mc3 import MedicalNetFeatures

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 1)), jnp.float32)
    base = MedicalNetFeatures(layers=(1, 1), temporal_mode="conv3d")
    folded = MedicalNetFeatures(layers=(1, 1), temporal_mode=mode)
    variables = base.init(jax.random.PRNGKey(3), x)
    v2 = folded.init(jax.random.PRNGKey(3), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    def loss(m):
        def f(params):
            y = m.apply({"params": params,
                         "batch_stats": variables["batch_stats"]}, x)
            return jnp.sum(y * y)
        return f

    ref_l, ref_g = jax.value_and_grad(loss(base))(variables["params"])
    got_l, got_g = jax.value_and_grad(loss(folded))(variables["params"])
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=2e-4)
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(got_g)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=3e-4, atol=3e-4, err_msg=str(pa))
