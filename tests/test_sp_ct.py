"""Depth-sharded CT trunk ≡ single device (eval, train BN stats, grads).

The halo-exchange spatial partitioning (parallel/sp_ct.py) must reproduce
the unsharded ``ResnetMC3_18`` bit-for-bit-ish in every temporal lowering
mode — ppermute chain-end zeros stand in for the conv's physical-boundary
zero padding, and train-mode BatchNorm syncs its statistics over the depth
axis group.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmmil_tpu.models.ct_mc3 import ResnetMC3_18
from llmmil_tpu.parallel import make_mesh
from llmmil_tpu.parallel.sp_ct import depth_sharded_ct, shard_volume


def _model(mode):
    return ResnetMC3_18(spacing_xy=2.0, remat=False, dtype=jnp.float32,
                        temporal_mode=mode)


def _volume(d=16, hw=32):
    rs = np.random.RandomState(0)
    return jnp.asarray(rs.rand(1, d, hw, hw, 1), jnp.float32)


@pytest.mark.parametrize("mode", ["dfold", "dsum", "conv3d"])
def test_eval_matches_single_device(mode):
    assert jax.device_count() >= 8
    model = _model(mode)
    x = _volume()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)

    mesh = make_mesh((8,), ("depth",))
    apply = depth_sharded_ct(model, mesh, axis="depth")
    got = apply(variables, shard_volume(x, mesh, "depth"), train=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_train_bn_stats_match():
    """Train mode: outputs AND updated BatchNorm running stats must equal
    the unsharded run (BN pmean over the depth axis group)."""
    model = _model("dfold")
    x = _volume()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want, vars_w = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])

    mesh = make_mesh((8,), ("depth",))
    apply = depth_sharded_ct(model, mesh, axis="depth")
    got, vars_g = apply(variables, shard_volume(x, mesh, "depth"),
                        train=True, mutable=["batch_stats"])
    # ~1e-4 drift on O(1) outputs: pmean-of-shard-means reassociates the
    # BN reductions, compounding through 18 BN layers (stats themselves
    # agree to 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-4)
    flat_w = jax.tree_util.tree_leaves_with_path(vars_w["batch_stats"])
    flat_g = jax.tree_util.tree_leaves_with_path(vars_g["batch_stats"])
    assert len(flat_w) == len(flat_g) > 0
    for (pw, lw), (pg, lg) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=str(pw))


def test_grads_match_single_device():
    model = _model("dfold")
    x = _volume(d=8, hw=16)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    stats = {k: v for k, v in variables.items() if k != "params"}

    def loss_ref(p):
        out = model.apply({"params": p, **stats}, x, train=False)
        return jnp.sum(out ** 2)

    mesh = make_mesh((8,), ("depth",))
    apply = depth_sharded_ct(model, mesh, axis="depth")
    xs = shard_volume(x, mesh, "depth")

    def loss_sp(p):
        out = apply({"params": p, **stats}, xs, train=False)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_sp = jax.grad(loss_sp)(params)
    for (pr, lr), (ps, ls) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_sp)):
        assert pr == ps
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lr),
                                   atol=2e-4, rtol=1e-4, err_msg=str(pr))


def test_indivisible_depth_raises():
    model = _model("dfold")
    mesh = make_mesh((8,), ("depth",))
    apply = depth_sharded_ct(model, mesh, axis="depth")
    x = _volume(d=12)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="divisible"):
        apply(variables, x, train=False)


def test_flagship_probs_match_with_sharded_ct_features():
    """Full flagship forward fed depth-sharded CT features must reproduce
    the unsharded forward (the ct_features serving path)."""
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.parallel.sp_ct import flagship_ct_features

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", aggregator="TransMIL",
                 loss_point="CT-Pth-Last", spacing=[2.0, 2.0, 2.5],
                 compute_dtype="float32", ct_temporal_mode="dfold",
                 clip_vocab=64, clip_context=16, clip_width=32,
                 clip_heads=4, clip_layers=1, clip_embed=16)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    B, N = 1, 128
    toks = rs.randint(1, cfg.clip_vocab - 2,
                      (B, cfg.n_clinical + 1, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    batch = {"input_CT": jnp.asarray(rs.rand(B, 16, 32, 32, 1), jnp.float32),
             "input_pathology": jnp.asarray(rs.randn(B, N, 768), jnp.float32),
             "mask_pathology": jnp.asarray(np.arange(N)[None] < 100),
             "input_CI": jnp.asarray(toks, jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    want = model.apply(variables, batch, train=False)

    mesh = make_mesh((8,), ("depth",))
    feat = flagship_ct_features(cfg, variables, batch["input_CT"], mesh)
    batch2 = dict(batch, ct_features=feat)
    got = model.apply(variables, batch2, train=False)
    for k in ("probs", "probs_CT", "probs_Pth"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def test_flagship_ct_features_rejects_non_mc3():
    from llmmil_tpu.config import Config
    from llmmil_tpu.parallel.sp_ct import flagship_ct_features

    cfg = Config(modality=["CT"], model_CT="medicalNet")
    mesh = make_mesh((8,), ("depth",))
    with pytest.raises(ValueError, match="MC3"):
        flagship_ct_features(cfg, {"params": {}}, None, mesh)


def test_flagship_ct_features_train_mode():
    """ADVICE r2: flagship_ct_features(train=True) must run train-mode BN
    (mutable batch_stats threaded through shard_map) and return
    (features, updated_vars) matching the unsharded extractor."""
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.models.aggregator import make_ct_extractor
    from llmmil_tpu.parallel.sp_ct import flagship_ct_features

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", aggregator="TransMIL",
                 loss_point="CT-Pth-Last", spacing=[2.0, 2.0, 2.5],
                 compute_dtype="float32", ct_temporal_mode="dfold",
                 clip_vocab=64, clip_context=16, clip_width=32,
                 clip_heads=4, clip_layers=1, clip_embed=16)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    B, N = 1, 64
    toks = rs.randint(1, cfg.clip_vocab - 2,
                      (B, cfg.n_clinical + 1, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    vol = jnp.asarray(rs.rand(B, 8, 32, 32, 1), jnp.float32)
    batch = {"input_CT": vol,
             "input_pathology": jnp.asarray(rs.randn(B, N, 768),
                                            jnp.float32),
             "mask_pathology": jnp.asarray(np.arange(N)[None] < 50),
             "input_CI": jnp.asarray(toks, jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    sub = {coll: tree["extractor_CT"] for coll, tree in variables.items()
           if "extractor_CT" in tree}
    ext = make_ct_extractor(cfg, jnp.float32)
    want, vars_w = ext.apply(sub, vol, train=True, mutable=["batch_stats"])

    mesh = make_mesh((8,), ("depth",))
    got, vars_g = flagship_ct_features(cfg, variables, vol, mesh,
                                       train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-4)
    flat_w = jax.tree_util.tree_leaves_with_path(vars_w["batch_stats"])
    flat_g = jax.tree_util.tree_leaves_with_path(vars_g["batch_stats"])
    assert len(flat_w) == len(flat_g) > 0
    for (pw, lw), (pg, lg) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                   atol=1e-5, rtol=1e-4, err_msg=str(pw))


def test_depth_sharded_train_step_matches_plain():
    """VERDICT r2 #4: a flagship train step with the CT trunk depth-sharded
    over a 2-D ('data','depth') mesh must produce the same params, metrics,
    and BN stats as the plain (unsharded jit) step."""
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model
    from llmmil_tpu.parallel import replicate, shard_batch
    from llmmil_tpu.train import create_train_state, make_train_step

    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", aggregator="TransMIL",
                 loss_point="CT-Pth-Last", loss="BCE+textCosSim",
                 spacing=[2.0, 2.0, 2.5], learnablePrompt=1, n_ctx=8,
                 compute_dtype="float32", ct_temporal_mode="dfold",
                 clip_vocab=128, clip_context=16, clip_width=32,
                 clip_heads=4, clip_layers=1, clip_embed=16)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    B, N = 4, 64
    toks = rs.randint(1, cfg.clip_vocab - 2,
                      (B, cfg.n_clinical + 1, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    batch = {"input_CT": jnp.asarray(rs.rand(B, 8, 16, 16, 1), jnp.float32),
             "input_pathology": jnp.asarray(rs.randn(B, N, 768),
                                            jnp.float32),
             "mask_pathology": jnp.asarray(
                 np.arange(N)[None] < rs.randint(N // 2, N, (B, 1))),
             "input_CI": jnp.asarray(toks, jnp.int32),
             "label": jnp.asarray(np.eye(2)[rs.randint(0, 2, B)],
                                  jnp.float32)}
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    s0, m0 = make_train_step(cfg, donate=False)(state, batch, rng)

    cfg2 = cfg.replace(ct_shard_axis="depth", mesh_shape=[-1, 2],
                       mesh_axes=["data", "depth"])
    mesh = make_mesh((4, 2), ("data", "depth"))
    s1, m1 = make_train_step(cfg2, donate=False, mesh=mesh)(
        replicate(state, mesh), shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
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


def test_ct_shard_axis_requires_mesh_and_mc3():
    from llmmil_tpu.config import Config
    from llmmil_tpu.train import make_train_step

    cfg = Config(modality=["CT"], model_CT="resnetMC3_18",
                 ct_shard_axis="depth")
    with pytest.raises(ValueError, match="mesh"):
        make_train_step(cfg, donate=False)
    mesh = make_mesh((8,), ("depth",))
    cfg2 = cfg.replace(model_CT="medicalNet")
    with pytest.raises(ValueError, match="MC3"):
        make_train_step(cfg2, donate=False, mesh=mesh)
