"""Pallas conv3x3 kernel ≡ lax.conv_general_dilated (fwd + both grads).

Interpret mode on CPU; the on-TPU compiled path is benchmarked/validated by
scripts/bench_conv3x3.py and locked by the bf16 goldens."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.ops.pallas.conv3x3 import (conv3x3, conv3x3_reference,
                                           conv3x3_vmem_bytes)


def _data(n=2, h=16, w=16, c=8, f=4, seed=0, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(n, h, w, c), dtype)
    k = jnp.asarray(rs.randn(3, 3, c, f) * 0.1, dtype)
    return x, k


@pytest.mark.parametrize("bh", [4, 16])
def test_fwd_matches_xla(bh):
    x, k = _data()
    want = conv3x3_reference(x, k)
    got = conv3x3(x, k, bh, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fwd_non_divisible_rows():
    x, k = _data(h=10, w=16)          # bh falls back to a divisor of 10
    want = conv3x3_reference(x, k)
    got = conv3x3(x, k, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_grads_match_xla():
    x, k = _data()
    dy = jnp.asarray(np.random.RandomState(1).randn(*x.shape[:3], 4),
                     jnp.float32)

    def loss_ref(x_, k_):
        return jnp.sum(conv3x3_reference(x_, k_) * dy)

    def loss_ker(x_, k_):
        return jnp.sum(conv3x3(x_, k_, 4, True) * dy)

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_k, gk_k = jax.grad(loss_ker, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_k), np.asarray(gk_r),
                               atol=1e-4, rtol=1e-4)


def test_bf16_close_to_fp32_reference():
    x, k = _data(dtype=jnp.float32)
    want = conv3x3_reference(x, k)
    got = conv3x3(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), 4, True)
    # bf16 input rounding only — accumulation is fp32 in both paths
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.05, rtol=0.05)


def test_rejects_non_3x3():
    x, _ = _data()
    with pytest.raises(ValueError, match="3×3"):
        conv3x3(x, jnp.zeros((5, 5, 8, 4)), 4, True)


def test_vmem_estimate_production_shape():
    # layer1 dfold shape must fit a 16 MiB VMEM budget with headroom
    assert conv3x3_vmem_bytes((160, 128, 128, 192), 64) < 15 * 2 ** 20


def test_trunk_pallas_backend_matches_xla():
    """ResnetMC3_18 with conv_backend='pallas' (interpret for CPU) must
    reproduce the XLA-backed trunk bit-closely — same params, fwd + grads."""
    from llmmil_tpu.models.ct_mc3 import ResnetMC3_18

    mx = ResnetMC3_18(spacing_xy=2.0, remat=False, temporal_mode="dfold",
                      dtype=jnp.float32)
    mp = mx.clone(conv_backend="pallas_interpret")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 16, 16, 1),
                    jnp.float32)
    variables = mx.init(jax.random.PRNGKey(0), x, train=False)
    want = mx.apply(variables, x, train=False)
    got = mp.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    stats = {k: v for k, v in variables.items() if k != "params"}

    def loss(m, p):
        return jnp.sum(m.apply({"params": p, **stats}, x, train=False) ** 2)

    gx = jax.grad(lambda p: loss(mx, p))(variables["params"])
    gp = jax.grad(lambda p: loss(mp, p))(variables["params"])
    for (px, lx), (pp, lp) in zip(
            jax.tree_util.tree_leaves_with_path(gx),
            jax.tree_util.tree_leaves_with_path(gp)):
        assert px == pp
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   atol=1e-3, rtol=1e-3, err_msg=str(px))
