"""Mixture-of-Experts FFN + expert parallelism (models/moe.py,
parallel/ep.py).

Beyond reference: the reference TransLayer is attention-only
(model/dim1/TransMIL.py:8-28), so MoE is a flag-gated extension —
moe_experts=0 (default) must leave every reference-parity config
untouched.  Invariants pinned here:

- routing semantics: masked tokens are never dispatched (exact-zero FFN
  output), kept gates renormalise, capacity overflow degrades gracefully;
- the Switch aux loss is ≈1 at a fresh (near-uniform) router and reaches
  the train step's loss/metrics with gradients flowing to the MoE params;
- an EP train step on a ('data','expert') mesh matches the replicated-DP
  step (annotations move tiles, not math) with genuinely sharded experts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from llmmil_tpu.config import Config
from llmmil_tpu.models import build_model
from llmmil_tpu.models.moe import MoEFFN, MoESpec, spec_from_config
from llmmil_tpu.parallel import make_mesh, replicate, shard_batch
from llmmil_tpu.parallel.ep import shard_state_ep
from llmmil_tpu.train import create_train_state, make_train_step


def test_off_by_default():
    assert spec_from_config(Config(modality=["CT"])) is None


def _ffn(n=20, b=2, dim=16, hidden=32, e=4, g=8, k=2, cf=2.0, seed=0):
    m = MoEFFN(dim=dim, hidden=hidden, n_experts=e, k=k,
               capacity_factor=cf, group_size=g)
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, n, dim), jnp.float32)
    mask = jnp.asarray(np.arange(n)[None] < [[13], [20]])
    variables = m.init(jax.random.PRNGKey(seed), x, mask)
    # init runs with every collection mutable, so it sows a 'moe' aux value
    # too — drop it like create_train_state does (train/state.py keeps only
    # params/batch_stats)
    return m, {"params": variables["params"]}, x, mask


def test_masked_tokens_get_exact_zero():
    m, variables, x, mask = _ffn()
    y = m.apply(variables, x, mask)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_array_equal(np.asarray(y)[0, 13:], 0.0)
    # valid rows are (generically) nonzero
    assert np.abs(np.asarray(y)[0, :13]).max() > 0


def test_full_capacity_routes_every_valid_token():
    """cf large enough that nothing drops: every valid token's FFN output
    equals its top-k expert mix computed directly."""
    m, variables, x, mask = _ffn(cf=8.0, k=1)
    y = np.asarray(m.apply(variables, x, mask))
    p = variables["params"]
    probs = jax.nn.softmax(
        np.asarray(x) @ np.asarray(p["router"]["kernel"]), axis=-1)
    w1, b1 = np.asarray(p["w1"]), np.asarray(p["b1"])
    w2, b2 = np.asarray(p["w2"]), np.asarray(p["b2"])
    msk = np.asarray(mask)
    for bi in range(x.shape[0]):
        for t in range(x.shape[1]):
            if not msk[bi, t]:
                continue
            ei = int(np.argmax(probs[bi, t]))
            # k=1 renormalised gate == 1: pure expert output
            h = np.maximum(np.asarray(x)[bi, t] @ w1[ei] + b1[ei], 0.0)
            np.testing.assert_allclose(y[bi, t], h @ w2[ei] + b2[ei],
                                       rtol=1e-4, atol=1e-5)


def test_capacity_overflow_drops_not_crashes():
    m, variables, x, mask = _ffn(cf=0.1)     # cap = 1 slot/expert/group
    y = np.asarray(m.apply(variables, x, mask))
    assert np.all(np.isfinite(y))
    # some tokens must have been dropped to the residual (exact zeros)
    assert (np.abs(y[np.asarray(mask)]).max(axis=-1) == 0).any()


def test_aux_loss_near_one_at_fresh_router():
    m, variables, x, mask = _ffn()
    _, state = m.apply(variables, x, mask, mutable=["moe"])
    (aux,) = jax.tree_util.tree_leaves(state["moe"])
    assert 0.5 < float(aux) < 2.0


def _tiny_flagship_cfg(**kw):
    base = dict(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                model_pathology="TransMIL", model_CI="CLIP",
                CI_input_version="text", aggregator="TransMIL",
                loss_point="CT-Pth-Last", loss="BCE+textCosSim",
                spacing=[2.0, 2.0, 2.5], learnablePrompt=1, n_ctx=8,
                compute_dtype="float32", ct_temporal_mode="dfold",
                clip_vocab=128, clip_context=16, clip_width=32,
                clip_heads=4, clip_layers=1, clip_embed=16,
                moe_experts=4, moe_hidden=64, moe_group=32)
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


def test_flagship_train_step_with_moe():
    """MoE params exist under the aggregator's TransLayers, the aux loss
    reaches the metrics, gradients update the experts, eval runs."""
    cfg = _tiny_flagship_cfg()
    model = build_model(cfg)
    batch = _tiny_flagship_batch(cfg, B=2, N=32)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    moe_paths = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(state.params)
                 if "'moe'" in jax.tree_util.keystr(p)]
    assert any("w1" in p for p in moe_paths), moe_paths
    w1_before = np.asarray(
        state.params["aggregator"]["layer1"]["moe"]["w1"])

    step = make_train_step(cfg, donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 < float(metrics["moe_aux"]) < 4.0
    w1_after = np.asarray(
        state2.params["aggregator"]["layer1"]["moe"]["w1"])
    assert np.abs(w1_after - w1_before).max() > 0, "no grad reached MoE"

    # eval path: sow is a silent no-op without the mutable collection
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = model.apply(variables, batch, train=False)
    assert np.all(np.isfinite(np.asarray(out["probs"])))


def test_tp_ep_merged_rules():
    """EP + TP compose over one axis as a merged rule pass (disjoint
    path sets): experts shard dim 0, Megatron rules untouched, the MoE
    router stays replicated."""
    from llmmil_tpu.parallel.ep import EP_RULES
    from llmmil_tpu.parallel.tp import DEFAULT_TP_RULES, tp_spec
    rules = DEFAULT_TP_RULES + EP_RULES
    assert tp_spec("agg/layer1/moe/w1", (4, 512, 64), 2, "model",
                   rules) == P("model", None, None)
    assert tp_spec("agg/layer2/moe/b2", (4, 512), 2, "model",
                   rules) == P("model", None)
    assert tp_spec("agg/layer1/moe/router/kernel", (512, 4), 2, "model",
                   rules) == P()
    assert tp_spec("layer1/attn/to_qkv/kernel", (512, 1536), 2, "model",
                   rules) == P(None, "model")


def test_ep_train_step_matches_replicated():
    """One EP step on a (data=4, expert=2) mesh == the replicated-DP step;
    the expert params are genuinely sharded on device."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = _tiny_flagship_cfg()
    model = build_model(cfg)
    batch = _tiny_flagship_batch(cfg)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    mesh = make_mesh((4, 2), ("data", "expert"))
    sbatch = shard_batch(batch, mesh)

    step_dp = make_train_step(cfg, donate=False)
    s0 = replicate(state, mesh)
    s0, m0 = step_dp(s0, sbatch, rng)

    s1, shardings = shard_state_ep(state, mesh, "expert")
    sharded = {jax.tree_util.keystr(p): s.spec for p, s in
               jax.tree_util.tree_leaves_with_path(shardings.params)
               if s.spec != P()}
    assert sharded and all("moe" in k for k in sharded), sharded
    assert any("w1" in k for k in sharded) and \
        any("w2" in k for k in sharded)
    assert all(sp[0] == "expert" for sp in sharded.values())
    step_ep = make_train_step(cfg, donate=False,
                              state_shardings=shardings)
    s1, m1 = step_ep(s1, sbatch, rng)
    # on-device shards really hold half the experts
    w1 = s1.params["aggregator"]["layer1"]["moe"]["w1"]
    assert w1.addressable_shards[0].data.shape[0] * 2 == w1.shape[0]

    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(m1["moe_aux"]),
                               float(m0["moe_aux"]), atol=1e-5, rtol=1e-5)
    for (p0, l0), (p1, l1) in zip(
            jax.tree_util.tree_leaves_with_path(s0.params),
            jax.tree_util.tree_leaves_with_path(s1.params)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(p0))
