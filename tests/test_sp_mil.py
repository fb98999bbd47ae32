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


def test_instance_sharded_model_matches_unsharded():
    """AggregatorClip with the bag's instance axis 8-way sharded: probs,
    features, and parameter grads must match the single-device model."""
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.parallel.sp_mil import instance_sharded_apply

    cfg = Config(modality=["pathology", "CI"], model_CI="simpleFCs_v1",
                 CI_input_version="v1", model_family="clip",
                 aggregator="ABMIL", compute_dtype="float32",
                 use_pallas=False)
    rs = np.random.RandomState(0)
    B, N = 2, 256
    batch = {"input_pathology": jnp.asarray(rs.randn(B, N, 768),
                                            jnp.float32),
             "mask_pathology": jnp.asarray(
                 np.arange(N)[None] < np.array([[200], [N]])),
             "input_CI": jnp.asarray(rs.rand(B, 9), jnp.float32),
             "label": jnp.asarray(np.eye(2)[rs.randint(0, 2, B)],
                                  jnp.float32)}

    ref_model = build_model(cfg)
    variables = ref_model.init(jax.random.PRNGKey(0), batch)
    want = ref_model.apply(variables, batch, train=False)

    mesh = make_mesh((8,), ("inst",))
    sp_model = build_model(cfg.replace(bag_shard_axis="inst"))
    apply = instance_sharded_apply(sp_model, mesh, axis="inst")
    got = apply(variables, batch, train=False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)

    def loss_ref(p):
        out = ref_model.apply({"params": p}, batch, train=False)
        return jnp.sum(out["probs"] ** 2)

    def loss_sp(p):
        out = apply({"params": p}, batch, train=False)
        return jnp.sum(out["probs"] ** 2)

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_sp = jax.grad(loss_sp)(variables["params"])
    for (pr, lr), (ps, ls) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_sp)):
        assert pr == ps
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lr),
                                   atol=2e-5, rtol=1e-4, err_msg=str(pr))


def test_instance_sharded_indivisible_raises():
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.parallel.sp_mil import instance_sharded_apply

    cfg = Config(modality=["pathology"], model_family="clip",
                 aggregator="ABMIL", bag_shard_axis="inst",
                 use_pallas=False)
    mesh = make_mesh((8,), ("inst",))
    apply = instance_sharded_apply(build_model(cfg), mesh, axis="inst")
    batch = {"input_pathology": jnp.zeros((1, 100, 768), jnp.float32)}
    with pytest.raises(ValueError, match="divisible"):
        apply({"params": {}}, batch)


def test_abmil_shard_axis_requires_k1():
    """ADVICE r2: shard_axis with K != 1 must fail loudly, not fall through
    to a per-shard-normalized softmax."""
    from llmmil_tpu.models.abmil import ABMIL

    model = ABMIL(L=16, D=8, K=2, shard_axis="inst")
    x = jnp.ones((1, 8, 16), jnp.float32)
    with pytest.raises(ValueError, match="K == 1"):
        model.init(jax.random.PRNGKey(0), x)


def test_sharded_dropout_masks_differ_across_shards():
    """ADVICE r2: inside shard_map each instance shard must draw an
    independent dropout mask (shard index folded into the rng), matching
    the unsharded model's i.i.d. dropout over all N instances."""
    from jax.sharding import PartitionSpec as P
    from llmmil_tpu.models.abmil import ABMIL

    mesh = make_mesh((8,), ("inst",))
    B, N, L = 1, 256, 32
    x = jnp.ones((B, N, L), jnp.float32)   # identical rows: any att
    mask = jnp.ones((B, N), bool)          # difference is dropout-driven
    ref = ABMIL(L=L, D=16, K=1, dropout=0.5)
    variables = ref.init(jax.random.PRNGKey(0), x)
    sp = ABMIL(L=L, D=16, K=1, dropout=0.5, shard_axis="inst")

    def body(v, xl, ml):
        _, att = sp.apply(v, xl, ml, True,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        return att

    att = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, "inst", None), P(None, "inst")),
        out_specs=P(None, None, "inst"))(variables, x, mask)
    blocks = np.asarray(att).reshape(8, N // 8)
    for k in range(1, 8):
        assert not np.allclose(blocks[0], blocks[k]), (
            f"shard {k} drew the same dropout mask as shard 0")
