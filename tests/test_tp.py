"""Tensor (model) parallelism (parallel/tp.py).

Beyond reference: its DDP keeps every weight matrix whole per rank
(train_ddp.py:79).  Invariants pinned here:

- the path-keyed Megatron rules shard the right dims (qkv/fc1 output dim,
  out-proj/fc2 input dim, column-parallel biases) and replicate the rest;
- a TP train step on a ('data','model') mesh produces the SAME
  params/metrics as the replicated data-parallel step (sharding
  annotations change where tiles are computed, not the math);
- attention/MLP kernels are genuinely sharded on device, the output state
  keeps the pinned layout across steps;
- TP composes with FSDP (ZeRO on the non-TP dims) and still matches DP.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from llmmil_tpu.config import Config
from llmmil_tpu.models import build_model
from llmmil_tpu.parallel import make_mesh, replicate, shard_batch
from llmmil_tpu.parallel.tp import tp_spec, tp_shardings, shard_state_tp
from llmmil_tpu.train import create_train_state, make_train_step


def test_tp_spec_rules():
    # column-parallel: fused qkv + first MLP matmul shard the OUTPUT dim
    assert tp_spec("clip/resblock_0/attn/in_proj/kernel",
                   (32, 96), 2, "model") == P(None, "model")
    assert tp_spec("pathology/layer1/attn/to_qkv/kernel",
                   (512, 1536), 2, "model") == P(None, "model")
    assert tp_spec("resblock_0/c_fc/kernel",
                   (32, 128), 4, "model") == P(None, "model")
    assert tp_spec("layers_0/mlp/lin1/kernel",
                   (512, 2048), 8, "model") == P(None, "model")
    # ...and their biases shard along the same (now leading) dim
    assert tp_spec("attn/in_proj/bias", (96,), 2, "model") == P("model")
    assert tp_spec("c_fc/bias", (128,), 4, "model") == P("model")
    # row-parallel: out-proj + second MLP matmul shard the INPUT dim
    assert tp_spec("attn/out_proj/kernel",
                   (32, 32), 2, "model") == P("model", None)
    assert tp_spec("layer2/attn/to_out/kernel",
                   (512, 512), 2, "model") == P("model", None)
    assert tp_spec("resblock_3/c_proj/kernel",
                   (128, 32), 4, "model") == P("model", None)
    # row-parallel biases add AFTER the all-reduce: replicated
    assert tp_spec("attn/out_proj/bias", (32,), 2, "model") == P()
    assert tp_spec("c_proj/bias", (32,), 4, "model") == P()
    # unmatched paths replicate (LayerNorm, embeddings, convs, heads)
    assert tp_spec("ln_1/scale", (32,), 2, "model") == P()
    assert tp_spec("token_embedding/embedding",
                   (128, 32), 2, "model") == P()
    assert tp_spec("extractor_CT/stem/conv/kernel",
                   (3, 7, 7, 1, 64), 2, "model") == P()
    # matched but non-divisible dim falls back to replicated, not an error
    assert tp_spec("attn/in_proj/kernel", (32, 33), 2, "model") == P()


def test_tp_axis_must_be_in_mesh():
    mesh = make_mesh((8,), ("data",))
    with pytest.raises(ValueError, match="tp axis"):
        tp_shardings({"w": jnp.zeros((8, 8))}, mesh, axis="model")
    mesh2 = make_mesh((4, 2), ("data", "model"))
    with pytest.raises(ValueError, match="fsdp axis"):
        tp_shardings({"w": jnp.zeros((8, 8))}, mesh2, axis="model",
                     fsdp_axis="zero")


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


def _assert_state_close(s_ref, s_tp, atol):
    for tree0, tree1, tag in ((s_ref.params, s_tp.params, "param"),
                              (s_ref.batch_stats, s_tp.batch_stats, "bn")):
        for (p0, l0), (p1, l1) in zip(
                jax.tree_util.tree_leaves_with_path(tree0),
                jax.tree_util.tree_leaves_with_path(tree1)):
            assert p0 == p1
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                       atol=atol, rtol=1e-4,
                                       err_msg=f"{tag} {p0}")


def test_tp_train_step_matches_dp():
    """Two TP steps on a (data=4, model=2) mesh == two replicated-DP steps;
    the transformer kernels are genuinely sharded on device and keep the
    pinned layout across steps."""
    cfg = _tiny_flagship_cfg()
    model = build_model(cfg)
    batch = _tiny_flagship_batch(cfg)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    mesh = make_mesh((4, 2), ("data", "model"))
    sbatch = shard_batch(batch, mesh)

    # replicated DP reference (same mesh: batch placement is identical)
    step_dp = make_train_step(cfg, donate=False)
    s0 = replicate(state, mesh)
    s0, m0 = step_dp(s0, sbatch, rng)
    s0, m0b = step_dp(s0, sbatch, rng)

    s1, shardings = shard_state_tp(state, mesh, "model")
    step_tp = make_train_step(cfg, donate=False, state_shardings=shardings)
    s1, m1 = step_tp(s1, sbatch, rng)

    # the Megatron pairs are genuinely sharded: per-shard < global
    sharded = {jax.tree_util.keystr(p): x
               for p, x in jax.tree_util.tree_leaves_with_path(s1.params)
               if x.sharding.spec != P()}
    assert any("to_qkv" in k for k in sharded), sharded.keys()
    assert any("in_proj" in k and "kernel" in k for k in sharded)
    assert any("c_fc" in k for k in sharded)
    assert any("out_proj" in k or "to_out" in k for k in sharded)
    for k, x in sharded.items():
        shard = x.addressable_shards[0].data
        assert np.prod(shard.shape) * 2 == np.prod(x.shape), k

    s1, m1b = step_tp(s1, sbatch, rng)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(shardings.params)):
        assert a.sharding == b

    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(m1b["loss"]), float(m0b["loss"]),
                               atol=1e-5, rtol=1e-5)
    _assert_state_close(s0, s1, atol=2e-5)


def test_tp_composes_with_fsdp():
    """tp_axis + fsdp_axis: TP dims shard over 'model', the largest
    remaining dim of big leaves shards over 'data' — and one step still
    matches plain DP."""
    cfg = _tiny_flagship_cfg()
    model = build_model(cfg)
    batch = _tiny_flagship_batch(cfg)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    mesh = make_mesh((4, 2), ("data", "model"))
    sbatch = shard_batch(batch, mesh)

    step_dp = make_train_step(cfg, donate=False)
    s0 = replicate(state, mesh)
    s0, m0 = step_dp(s0, sbatch, rng)

    s1, shardings = shard_state_tp(state, mesh, "model", fsdp_axis="data")
    # a TP kernel big enough for both axes carries both: e.g. TransMIL's
    # to_qkv (512, 1536) -> P('data', 'model')
    specs = {jax.tree_util.keystr(p): s.spec
             for p, s in jax.tree_util.tree_leaves_with_path(
                 shardings.params)}
    both = [k for k, sp in specs.items()
            if sp == P("data", "model") or sp == P("model", "data")]
    assert both, "no leaf carries TP + FSDP axes together"
    step_tp = make_train_step(cfg, donate=False, state_shardings=shardings)
    s1, m1 = step_tp(s1, sbatch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               atol=1e-5, rtol=1e-5)
    # looser than the pure-TP test: FSDP's reduce-scatter reorders the
    # gradient sum, and at step 1 Adam's normalized update turns a
    # reduction-order sign flip of a near-zero grad into a ±2·lr param
    # jump (observed 3.1e-5 on 8/25088 elements of a PPEG kernel)
    _assert_state_close(s0, s1, atol=1e-4)
