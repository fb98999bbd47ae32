"""Pallas fused MIL-pooling kernel: exactness vs the plain-JAX reference
(interpret mode on CPU; the compiled path is exercised on real TPU by
bench.py and the verify drive)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.ops.pallas import mil_pool, mil_pool_reference


def _setup(B=2, N=700, L=256, D=192, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, N, L), jnp.float32)
    n_valid = rs.randint(N // 2, N + 1, (B, 1))
    mask = jnp.asarray(np.arange(N)[None] < n_valid)
    params = [jnp.asarray(rs.randn(L, D) * 0.05, jnp.float32),
              jnp.asarray(rs.randn(D) * 0.05, jnp.float32),
              jnp.asarray(rs.randn(L, D) * 0.05, jnp.float32),
              jnp.asarray(rs.randn(D) * 0.05, jnp.float32),
              jnp.asarray(rs.randn(D, 1) * 0.05, jnp.float32),
              jnp.asarray(rs.randn(1) * 0.05, jnp.float32)]
    return x, mask, params


def test_kernel_matches_reference_forward():
    x, mask, params = _setup()
    ref_p, ref_a = mil_pool_reference(x, mask, *params)
    out_p, out_a = mil_pool(x, mask, *params, 512, True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a),
                               atol=1e-7)


def test_kernel_non_divisible_bag_padding():
    """N=700 with block 512 pads internally to 1024; padded rows must not
    contribute (their mask is False)."""
    x, mask, params = _setup(N=700)
    x130, mask130, _ = _setup(N=130)
    out_p, out_a = mil_pool(x130, mask130, *params, 512, True)
    ref_p, ref_a = mil_pool_reference(x130, mask130, *params)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p),
                               atol=1e-5)
    assert out_a.shape == (2, 130)


def test_kernel_gradients_match_reference():
    x, mask, params = _setup(B=1, N=300, L=128, D=64)

    def lk(x, wv):
        p = [wv] + params[1:]
        return mil_pool(x, mask, *p, 256, True)[0].sum()

    def lr(x, wv):
        p = [wv] + params[1:]
        return mil_pool_reference(x, mask, *p)[0].sum()

    gk = jax.grad(lk, argnums=(0, 1))(x, params[0])
    gr = jax.grad(lr, argnums=(0, 1))(x, params[0])
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_abmil_module_pallas_path_matches_jnp():
    """ABMIL(use_pallas=True) (interpret via monkeypatched flag) must equal
    the jnp path given the same params."""
    import llmmil_tpu.models.abmil as abmil_mod
    from llmmil_tpu.models import ABMIL

    x, mask, _ = _setup(B=2, N=300, L=64, D=32)
    m_ref = ABMIL(L=64, D=32, use_pallas=False)
    variables = m_ref.init(jax.random.PRNGKey(0), x, mask)
    ref, _ = m_ref.apply(variables, x, mask)

    orig = abmil_mod.mil_pool

    def interp_pool(*args, **kw):
        return orig(*args[:8], 512, True)

    abmil_mod.mil_pool = interp_pool
    try:
        m_k = ABMIL(L=64, D=32, use_pallas=True)
        got, _ = m_k.apply(variables, x, mask)
    finally:
        abmil_mod.mil_pool = orig
    np.testing.assert_allclose(np.asarray(got[:, 0]),
                               np.asarray(ref[:, 0]), atol=1e-5)


def test_resolve_use_pallas_ruling(monkeypatch):
    """'auto' applies the BENCH_NOTES r2 ruling: kernel only for raw-bag
    pooling, only on TPU; explicit bools force (still TPU-gated); CLI
    strings normalise."""
    import llmmil_tpu.ops.pallas as pk

    # CPU backend (this test env): everything resolves False
    assert pk.resolve_use_pallas("auto", raw_bag=True) is False
    assert pk.resolve_use_pallas(True, raw_bag=False) is False

    # pretend we're on TPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pk.resolve_use_pallas("auto", raw_bag=True) is True
    assert pk.resolve_use_pallas("auto", raw_bag=False) is False
    assert pk.resolve_use_pallas(True, raw_bag=False) is True
    assert pk.resolve_use_pallas(False, raw_bag=True) is False
    assert pk.resolve_use_pallas("true", raw_bag=False) is True
    assert pk.resolve_use_pallas("false", raw_bag=True) is False


def test_baselines_run_with_auto_on_cpu():
    """'auto' default must leave the CPU path untouched (kernel off)."""
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model

    cfg = Config(modality=["pathology"], model_family="concat",
                 compute_dtype="float32")
    model = build_model(cfg)
    x, mask, _ = _setup(B=2, N=130, L=768)
    batch = {"input_pathology": x, "mask_pathology": mask, "input_CI": None}
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert np.isfinite(np.asarray(out["probs"])).all()
