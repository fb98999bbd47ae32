"""FSDP / ZeRO-3 train-state sharding (parallel/fsdp.py).

Beyond reference: the reference's DDP replicates the whole model + Adam
moments per rank (train_ddp.py:79).  Invariants pinned here:

- the sharding rule shards the largest divisible dim and replicates small
  leaves;
- an FSDP train step produces the SAME params/metrics/BN stats as the
  replicated data-parallel step (only the reduction schedule differs);
- large state leaves are genuinely sharded on device (per-shard shape
  strictly smaller than the global shape);
- checkpoints written from a sharded state round-trip (device_get
  assembles the full arrays).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from llmmil_tpu.config import Config
from llmmil_tpu.models import build_model
from llmmil_tpu.parallel import make_mesh, replicate, shard_batch
from llmmil_tpu.parallel.fsdp import fsdp_shardings, fsdp_spec, shard_state
from llmmil_tpu.train import create_train_state, make_train_step
from llmmil_tpu.train import checkpoint as ckpt_lib


def test_fsdp_spec_rules():
    # shard the largest divisible dim
    assert fsdp_spec((512, 768), 8, "data") == P(None, "data")
    assert fsdp_spec((768, 512), 8, "data") == P("data", None)
    # ties/odd dims: pick the divisible one
    assert fsdp_spec((7, 4096), 8, "data") == P(None, "data")
    # nothing divisible -> replicated
    assert fsdp_spec((7, 9, 11), 8, "data") == P()
    # small leaves stay replicated regardless of divisibility
    assert fsdp_spec((512,), 8, "data") == P()
    assert fsdp_spec((), 8, "data") == P()
    # dim >= axis size required (no 0-sized shards)
    assert fsdp_spec((4, 4096), 8, "data", min_size=1) == P(None, "data")
    assert fsdp_spec((4, 4), 8, "data", min_size=1) == P()


def test_fsdp_axis_must_be_in_mesh():
    mesh = make_mesh((8,), ("data",))
    with pytest.raises(ValueError, match="fsdp axis"):
        fsdp_shardings({"w": jnp.zeros((8, 8))}, mesh, axis="model")


def _tiny_flagship_cfg(**kw):
    base = dict(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                model_pathology="TransMIL", model_CI="CLIP",
                CI_input_version="text", aggregator="TransMIL",
                loss_point="CT-Pth-Last", loss="BCE+textCosSim",
                spacing=[2.0, 2.0, 2.5], learnablePrompt=1, n_ctx=8,
                compute_dtype="float32", ct_temporal_mode="dfold",
                clip_vocab=128, clip_context=16, clip_width=32,
                clip_heads=4, clip_layers=1, clip_embed=16)
    base.update(kw)
    return Config(**base)


def _tiny_flagship_batch(cfg, B=8, N=64, seed=0):
    rs = np.random.RandomState(seed)
    toks = rs.randint(1, cfg.clip_vocab - 2,
                      (B, cfg.n_clinical + 1, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    return {"input_CT": jnp.asarray(rs.rand(B, 8, 16, 16, 1), jnp.float32),
            "input_pathology": jnp.asarray(rs.randn(B, N, 768),
                                           jnp.float32),
            "mask_pathology": jnp.asarray(
                np.arange(N)[None] < rs.randint(N // 2, N, (B, 1))),
            "input_CI": jnp.asarray(toks, jnp.int32),
            "label": jnp.asarray(np.eye(2)[rs.randint(0, 2, B)],
                                 jnp.float32)}


def test_fsdp_train_step_matches_dp():
    """Two FSDP steps == two replicated-DP steps (params, BN, metrics),
    and the big leaves are actually sharded on device."""
    cfg = _tiny_flagship_cfg()
    model = build_model(cfg)
    batch = _tiny_flagship_batch(cfg)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    mesh = make_mesh((8,), ("data",))
    sbatch = shard_batch(batch, mesh)

    # replicated DP reference
    step_dp = make_train_step(cfg, donate=False)
    s0 = replicate(state, mesh)
    s0, m0 = step_dp(s0, sbatch, rng)
    s0, m0b = step_dp(s0, sbatch, rng)

    # FSDP
    s1, shardings = shard_state(state, mesh, "data")
    step_fsdp = make_train_step(cfg, donate=False,
                                state_shardings=shardings)
    s1, m1 = step_fsdp(s1, sbatch, rng)

    # the big leaves are genuinely sharded: per-shard < global
    sharded_leaves = [
        x for x in jax.tree_util.tree_leaves(s1.params)
        if hasattr(x, "sharding") and x.sharding.spec != P()]
    assert sharded_leaves, "no parameter leaf ended up sharded"
    for x in sharded_leaves:
        shard = x.addressable_shards[0].data
        assert np.prod(shard.shape) * 8 == np.prod(x.shape)

    s1, m1b = step_fsdp(s1, sbatch, rng)
    # output state keeps the pinned sharded layout across steps
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(shardings.params)):
        assert a.sharding == b

    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(m1b["loss"]), float(m0b["loss"]),
                               atol=1e-5, rtol=1e-5)
    for tree0, tree1, atol, tag in ((s0.params, s1.params, 2e-5, "param"),
                                    (s0.batch_stats, s1.batch_stats, 1e-5,
                                     "bn")):
        for (p0, l0), (p1, l1) in zip(
                jax.tree_util.tree_leaves_with_path(tree0),
                jax.tree_util.tree_leaves_with_path(tree1)):
            assert p0 == p1
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                       atol=atol, rtol=1e-4,
                                       err_msg=f"{tag} {p0}")


def test_shard_batch_remainder_falls_back_to_replicated():
    """A last-batch remainder the data axis can't divide is placed
    replicated (exact numerics) instead of erroring — the reference's
    DistributedSampler instead duplicates samples to even out ranks."""
    mesh = make_mesh((8,), ("data",))
    odd = {"x": jnp.ones((3, 4)), "label": jnp.ones((3, 2))}
    placed = shard_batch(odd, mesh)
    assert placed["x"].sharding.spec == P()
    even = {"x": jnp.ones((8, 4)), "label": jnp.ones((8, 2))}
    placed = shard_batch(even, mesh)
    assert placed["x"].sharding.spec == P("data")


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """A checkpoint written from a sharded state restores bit-identically
    (device_get assembles the sharded leaves), and resume() re-fills a
    fresh state."""
    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 CI_input_version="v1", loss_point="Last",
                 compute_dtype="float32", learnablePrompt=0,
                 grad_accum=2)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    batch = {"input_pathology": jnp.asarray(rs.randn(8, 64, 768),
                                            jnp.float32),
             "mask_pathology": jnp.ones((8, 64), bool),
             "input_CI": jnp.asarray(rs.rand(8, 9), jnp.float32),
             "label": jnp.asarray(np.eye(2)[rs.randint(0, 2, 8)],
                                  jnp.float32)}
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    mesh = make_mesh((8,), ("data",))
    sstate, shardings = shard_state(state, mesh, "data",
                                    min_size=64)  # tiny model: force shards
    step = make_train_step(cfg, donate=False, state_shardings=shardings)
    sstate, _ = step(sstate, shard_batch(batch, mesh), jax.random.PRNGKey(1))

    path = ckpt_lib.save_checkpoint(sstate, str(tmp_path), epoch=0)
    fresh = create_train_state(model, cfg, batch, jax.random.PRNGKey(7))
    restored, epoch, batch_off = ckpt_lib.resume(fresh, path)
    assert (epoch, batch_off) == (1, 0)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(sstate.params),
            jax.tree_util.tree_leaves_with_path(restored.params)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # grad_accum accumulator (MultiSteps state) rode the checkpoint too
    for a, b in zip(jax.tree_util.tree_leaves(sstate.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
