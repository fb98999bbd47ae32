"""Pipeline parallelism (parallel/pp.py).

Beyond reference: its DDP replicates every layer per rank
(train_ddp.py:79).  Invariants pinned here:

- the GPipe loop (microbatched scan + ppermute handoff) reproduces the
  sequential layer stack exactly — forward AND gradients, any
  stage-count/microbatch split, with or without a data axis;
- the CLIP text tower runs its resblocks through the ``blocks_fn`` hook
  with identical outputs and identical param tree;
- a pp_axis train step on a ('data','pipe') mesh matches the replicated
  data-parallel step;
- misuse (missing mesh axis, non-divisible layers) fails loudly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmmil_tpu.config import Config
from llmmil_tpu.models import build_model
from llmmil_tpu.parallel import make_mesh, replicate, shard_batch
from llmmil_tpu.parallel.pp import gpipe_blocks, clip_blocks_pipeline
from llmmil_tpu.train import create_train_state, make_train_step


def _toy_stack(L=4, d=8, seed=0):
    rs = np.random.RandomState(seed)
    stacked = {"w": jnp.asarray(rs.randn(L, d, d) * 0.3, jnp.float32),
               "b": jnp.asarray(rs.randn(L, d) * 0.1, jnp.float32)}

    def block_apply(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    def sequential(st, x):
        for i in range(st["w"].shape[0]):
            x = block_apply({"w": st["w"][i], "b": st["b"][i]}, x)
        return x

    return stacked, block_apply, sequential


@pytest.mark.parametrize("stages,n_micro", [(2, 2), (4, 2), (2, 4), (1, 2)])
def test_gpipe_matches_sequential(stages, n_micro):
    stacked, block_apply, sequential = _toy_stack()
    mesh = make_mesh((stages,), ("pipe",),
                     devices=jax.devices()[:stages])
    x = jnp.asarray(np.random.RandomState(1).randn(8, 5, 8), jnp.float32)
    y = gpipe_blocks(block_apply, stacked, x, mesh, "pipe", n_micro)
    np.testing.assert_allclose(np.asarray(y), np.asarray(sequential(
        stacked, x)), atol=1e-6, rtol=1e-6)


def test_gpipe_composes_with_data_axis():
    stacked, block_apply, sequential = _toy_stack()
    mesh = make_mesh((2, 2), ("data", "pipe"),
                     devices=jax.devices()[:4])
    x = jnp.asarray(np.random.RandomState(2).randn(8, 5, 8), jnp.float32)
    y = gpipe_blocks(block_apply, stacked, x, mesh, "pipe", 2,
                     batch_axis="data")
    np.testing.assert_allclose(np.asarray(y), np.asarray(sequential(
        stacked, x)), atol=1e-6, rtol=1e-6)


def test_gpipe_grads_match_sequential():
    """The autodiff transpose of the pipeline (reverse scan + inverted
    ppermute) IS the backward pipeline — grads wrt params and input match
    the sequential stack."""
    stacked, block_apply, sequential = _toy_stack()
    mesh = make_mesh((4, 2), ("data", "pipe"))
    x = jnp.asarray(np.random.RandomState(3).randn(8, 5, 8), jnp.float32)

    def loss_pp(st, x):
        return jnp.sum(gpipe_blocks(block_apply, st, x, mesh, "pipe", 2,
                                    batch_axis="data") ** 2)

    def loss_seq(st, x):
        return jnp.sum(sequential(st, x) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stacked, x)
    g_sq = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_sq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_gpipe_rejects_bad_splits():
    stacked, block_apply, _ = _toy_stack(L=3)
    mesh = make_mesh((2,), ("pipe",), devices=jax.devices()[:2])
    x = jnp.zeros((4, 2, 8))
    with pytest.raises(ValueError, match="layers"):
        gpipe_blocks(block_apply, stacked, x, mesh, "pipe", 2)
    with pytest.raises(ValueError, match="pipe axis"):
        gpipe_blocks(block_apply, stacked, x, mesh, "model", 2)


def test_clip_tower_blocks_fn_matches_plain():
    """CLIPTextEncoder with the pp hook: same params, same outputs."""
    from llmmil_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    tcfg = CLIPTextConfig(vocab_size=64, context_length=12, width=32,
                          heads=4, layers=2, embed_dim=16)
    enc = CLIPTextEncoder(tcfg)
    toks = jnp.asarray(
        np.random.RandomState(4).randint(1, 63, (6, 12)), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), toks)["params"]
    ref = enc.apply({"params": params}, toks)

    mesh = make_mesh((2,), ("pipe",), devices=jax.devices()[:2])
    bf = clip_blocks_pipeline(32, 4, jnp.float32, mesh, "pipe", n_micro=3)
    out = enc.clone(blocks_fn=bf).apply({"params": params}, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def _tiny_flagship_cfg(**kw):
    base = dict(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                model_pathology="TransMIL", model_CI="CLIP",
                CI_input_version="text", aggregator="TransMIL",
                loss_point="CT-Pth-Last", loss="BCE+textCosSim",
                spacing=[2.0, 2.0, 2.5], learnablePrompt=1, n_ctx=8,
                compute_dtype="float32", ct_temporal_mode="dfold",
                clip_vocab=128, clip_context=16, clip_width=32,
                clip_heads=4, clip_layers=2, clip_embed=16)
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


def test_pp_train_step_matches_dp():
    """A pp_axis train step on a (data=4, pipe=2) mesh == the replicated
    data-parallel step: the pipelined text tower changes WHERE each layer
    runs, not the math (CoOp ctx grads included — the pipelined blocks sit
    between the learnable context splice and the loss)."""
    cfg = _tiny_flagship_cfg()
    model = build_model(cfg)
    batch = _tiny_flagship_batch(cfg)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    mesh = make_mesh((4, 2), ("data", "pipe"))
    sbatch = shard_batch(batch, mesh)

    step_dp = make_train_step(cfg, donate=False)
    s0 = replicate(state, mesh)
    s0, m0 = step_dp(s0, sbatch, rng)

    cfg_pp = cfg.replace(pp_axis="pipe", pp_micro=2,
                         mesh_shape=[4, 2], mesh_axes=["data", "pipe"])
    step_pp = make_train_step(cfg_pp, donate=False, mesh=mesh)
    s1 = replicate(state, mesh)
    s1, m1 = step_pp(s1, sbatch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               atol=1e-5, rtol=1e-5)
    for (p0, l0), (p1, l1) in zip(
            jax.tree_util.tree_leaves_with_path(s0.params),
            jax.tree_util.tree_leaves_with_path(s1.params)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"param {p0}")
    # the CoOp learnable context DID move (grads flowed through the
    # pipelined stack into the spliced ctx)
    ctx0 = state.params["clinic_extractor"]["ctx"]
    ctx1 = s1.params["clinic_extractor"]["ctx"]
    assert float(jnp.max(jnp.abs(ctx1 - ctx0))) > 0


def test_pp_axis_requires_mesh_and_flagship():
    cfg = _tiny_flagship_cfg(pp_axis="pipe")
    with pytest.raises(ValueError, match="pp_axis"):
        make_train_step(cfg, donate=False, mesh=None)
    mesh = make_mesh((4, 2), ("data", "pipe"))
    with pytest.raises(ValueError, match="CLIP text"):
        make_train_step(cfg.replace(model_family="concat"),
                        donate=False, mesh=mesh)
