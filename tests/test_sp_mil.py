"""Sequence-parallel MIL pooling: 8-way instance sharding ≡ single device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.ops.pallas import mil_pool_reference
from llmmil_tpu.parallel import make_mesh
from llmmil_tpu.parallel.sp_mil import shard_bag, sharded_mil_pool


def test_sharded_pool_matches_single_device():
    assert jax.device_count() >= 8
    rs = np.random.RandomState(0)
    B, N, L, D = 2, 1024, 64, 32
    x = jnp.asarray(rs.randn(B, N, L), jnp.float32)
    mask = jnp.asarray(np.arange(N)[None] < np.array([[700], [1024]]))
    params = [jnp.asarray(rs.randn(L, D) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(D) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(L, D) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(D) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(D, 1) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(1) * 0.1, jnp.float32)]

    want, _ = mil_pool_reference(x, mask, *params)

    mesh = make_mesh((8,), ("data",))
    xs, ms = shard_bag(x, mask, mesh)
    got = sharded_mil_pool(xs, ms, *params, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_sharded_pool_grads_flow():
    mesh = make_mesh((8,), ("data",))
    rs = np.random.RandomState(1)
    B, N, L, D = 1, 256, 32, 16
    x = jnp.asarray(rs.randn(B, N, L), jnp.float32)
    mask = jnp.ones((B, N), bool)
    params = [jnp.asarray(rs.randn(L, D) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(D) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(L, D) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(D) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(D, 1) * 0.1, jnp.float32),
              jnp.asarray(rs.randn(1) * 0.1, jnp.float32)]

    def loss_sp(wv):
        p = [wv] + params[1:]
        return sharded_mil_pool(x, mask, *p, mesh=mesh).sum()

    def loss_ref(wv):
        p = [wv] + params[1:]
        return mil_pool_reference(x, mask, *p)[0].sum()

    g_sp = jax.grad(loss_sp)(params[0])
    g_ref = jax.grad(loss_ref)(params[0])
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               atol=1e-5)
