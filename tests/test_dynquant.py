"""Two-sided dynamic int8 attention GEMMs (ops/dynquant.py).

Invariants:
- flag OFF (the default): ``attn_dot`` is bit-identical to ``a @ b`` —
  training and plain serving numerics are untouched;
- flag ON: per-row/per-col dynamic scales keep the relative error of
  each product within int8 rounding (~1%);
- the flagship eval path (`evaluate(attn_int8=True)` plumbing via
  make-like apply) keeps probabilities within PTQ-style tolerance of the
  float path, and the mask-invariance contract survives quantization
  (masked rows are exact zeros both sides of the rounding).
"""

import numpy as np
import jax
import jax.numpy as jnp

from llmmil_tpu.ops.dynquant import (attn_dot, dynamic_int8_attention,
                                     dynamic_int8_enabled, int8_matmul)


def test_off_by_default_bit_identical():
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(2, 4, 8, 16), jnp.float32)
    b = jnp.asarray(rs.randn(2, 4, 16, 8), jnp.float32)
    assert not dynamic_int8_enabled()
    np.testing.assert_array_equal(np.asarray(attn_dot(a, b)),
                                  np.asarray(a @ b))


def test_int8_matmul_error_bound():
    rs = np.random.RandomState(1)
    # mixed ranges per row/col — the per-tensor failure mode
    a = rs.randn(3, 64, 96) * rs.lognormal(0, 1.5, (3, 64, 1))
    b = rs.randn(3, 96, 32) * rs.lognormal(0, 1.5, (3, 1, 32))
    a, b = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    want = np.asarray(a @ b)
    got = np.asarray(int8_matmul(a, b))
    # per-element bound: |Δy| ≤ Σ_k (|a| s_c + s_r |b| + s_r s_c)/2 with
    # s_r = rowmax/127, s_c = colmax/127 — check against that magnitude
    mag = np.abs(np.asarray(a)) @ np.abs(np.asarray(b))
    err = np.abs(got - want) / np.maximum(mag, 1e-9)
    assert err.max() < 0.02, err.max()


def test_context_is_trace_time():
    a = jnp.ones((2, 3, 4))
    b = jnp.ones((2, 4, 5))

    @jax.jit
    def f(a, b):
        return attn_dot(a, b)

    with dynamic_int8_attention():
        got_on = f(a, b)               # traced with the flag ON
    # the COMPILED executable keeps the traced mode
    got_on2 = f(a, b)
    np.testing.assert_array_equal(np.asarray(got_on), np.asarray(got_on2))


def test_nystrom_int8_close_and_mask_invariant():
    from llmmil_tpu.ops.nystrom import nystrom_attention
    rs = np.random.RandomState(2)
    b, h, n, dh, m = 1, 2, 64, 16, 16
    q = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    mask = jnp.asarray(np.arange(n)[None] < 48)
    mv = mask[:, None, :, None]
    qm, km, vm = (jnp.where(mv, t, 0.0) for t in (q, k, v))
    want, _ = nystrom_attention(qm, km, vm, num_landmarks=m, mask=mask)
    with dynamic_int8_attention():
        got, _ = nystrom_attention(qm, km, vm, num_landmarks=m, mask=mask)
    err = np.abs(np.asarray(got - want)).max() / \
        max(np.abs(np.asarray(want)).max(), 1e-9)
    assert err < 0.05, err
    # garbage in masked rows: zeroed before quant → identical output
    big = jnp.where(mv, q, 1e3)
    qg, kg, vg = (jnp.where(mv, t, 0.0) for t in (big, big, big))
    with dynamic_int8_attention():
        got2, _ = nystrom_attention(
            jnp.where(mv, q, 0.0), jnp.where(mv, k, 0.0),
            jnp.where(mv, v, 0.0), num_landmarks=m, mask=mask)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_flagship_eval_probs_within_tolerance():
    from llmmil_tpu.models import build_model
    from llmmil_tpu.config import Config
    cfg = Config(modality=["pathology"], model_CI="simpleFCs_v1",
                 aggregator="TransMIL", loss_point="Last",
                 compute_dtype="float32", learnablePrompt=0)
    model = build_model(cfg)
    rs = np.random.RandomState(3)
    n = 40
    batch = {"input_pathology": jnp.asarray(rs.randn(1, n, 768),
                                            jnp.float32),
             "mask_pathology": jnp.asarray(np.arange(n)[None] < 32),
             "input_CI": jnp.asarray(rs.randn(1, 9), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    want = np.asarray(model.apply(variables, batch, train=False)["probs"])
    with dynamic_int8_attention():
        got = np.asarray(model.apply(variables, batch,
                                     train=False)["probs"])
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, atol=0.05)


def test_reassociate_only_mode_is_float_exact_assoc():
    """'assoc' mode keeps exact matmuls; only the Nyström chain is
    reassociated — results match the default path to fp32 matmul-
    reassociation tolerance (~1e-5), with no quantization error."""
    from llmmil_tpu.ops.nystrom import nystrom_attention
    rs = np.random.RandomState(4)
    b, h, n, dh, m = 1, 2, 64, 16, 16
    q, k, v = (jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
               for _ in range(3))
    want, _ = nystrom_attention(q, k, v, num_landmarks=m)
    with dynamic_int8_attention(reassociate_only=True):
        got, _ = nystrom_attention(q, k, v, num_landmarks=m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # and no int8 rounding: far tighter than the quantized mode's error
    assert np.abs(np.asarray(got - want)).max() < 1e-4
