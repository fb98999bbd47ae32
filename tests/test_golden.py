"""Golden-value regression locks (VERDICT r1 #10) + loader invariances.

The flagship forward on a fixed seed and fixed synthetic batch must keep
producing the same numbers while rounds 2+ refactor kernels and layouts.
Values were captured on CPU in fp32 (jax_default_matmul_precision=highest,
set by conftest); tolerance covers only cross-platform FMA reassociation.
"""

import numpy as np
import jax
import jax.numpy as jnp

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, SyntheticCohort
from llmmil_tpu.models import build_model

# [probs, probs_CT, probs_Pth] for the fixed seed-0 init on the seed-42
# batch below — captured 2026-08-16 (round 2), CPU fp32 highest precision
GOLDEN_PROBS = [
    [[0.8145613670349121, 0.43382084369659424],
     [0.8245062828063965, 0.3878287971019745]],
    [[0.7623894214630127, 0.6643635034561157],
     [0.7724013328552246, 0.6757462024688721]],
    [[0.0802474170923233, 0.8337878584861755],
     [0.07664723694324493, 0.8515048027038574]],
]


def _tiny_flagship():
    cfg = Config(modality=["CT", "pathology"], model_CT="resnetMC3_18",
                 model_pathology="TransMIL", model_CI="CLIP",
                 CI_input_version="text", CI_prompt_version="devided",
                 aggregator="TransMIL", loss_point="CT-Pth-Last",
                 learnablePrompt=1, n_ctx=4, compute_dtype="float32",
                 spacing=[2.0, 2.0, 2.5], clip_vocab=128, clip_context=16,
                 clip_width=32, clip_heads=4, clip_layers=1, clip_embed=32)
    rs = np.random.RandomState(42)
    toks = rs.randint(1, cfg.clip_vocab - 2, (2, 10, cfg.clip_context))
    toks[..., -1] = cfg.clip_vocab - 1
    batch = {
        "input_CT": jnp.asarray(rs.rand(2, 8, 32, 32, 1), jnp.float32),
        "input_pathology": jnp.asarray(rs.randn(2, 48, 768), jnp.float32),
        "mask_pathology": jnp.asarray(np.arange(48)[None] < 40),
        "input_CI": jnp.asarray(toks, jnp.int32),
    }
    return cfg, batch


def _trained_tiny_flagship(n_steps: int = 20):
    """Tiny flagship after ``n_steps`` deterministic fp32 training steps
    (loss actually descending) — the bf16 golden anchor (VERDICT r3 #7:
    the UNTRAINED state amplifies bf16 rounding to a 0.55 prob drift; a
    trained state shrinks the amplification and permits a ~10× tighter
    lock).  Returns (cfg, eval_batch, trained_variables, losses)."""
    from llmmil_tpu.train import make_train_step
    from llmmil_tpu.train.state import create_train_state

    cfg, batch = _tiny_flagship()
    cfg = cfg.replace(lr=1e-3, batch_size=2)
    rs = np.random.RandomState(7)
    tb = dict(batch, label=jnp.asarray(np.eye(2)[rs.randint(0, 2, 2)],
                                       jnp.float32))
    model = build_model(cfg)
    state = create_train_state(model, cfg, tb, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    losses = []
    for i in range(n_steps):
        state, m = step(state, tb, jax.random.PRNGKey(i + 1))
        losses.append(float(m["loss"]))
    variables = {"params": state.params}
    if state.batch_stats is not None and jax.tree_util.tree_leaves(
            state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    return cfg, batch, variables, losses


def test_golden_flagship_forward():
    cfg, batch = _tiny_flagship()
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    got = np.asarray(
        jnp.stack([out["probs"], out["probs_CT"], out["probs_Pth"]]),
        dtype=np.float64)
    expected = np.array(GOLDEN_PROBS, dtype=np.float64)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_loader_worker_count_invariance():
    """Batches are identical at any num_workers (per-sample RNG streams)."""
    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 loss_point="Last", compute_dtype="float32",
                 learnablePrompt=0, batch_size=4, seed=7, bag_buckets=[128])
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=7)

    def batches(workers):
        ds = syn.dataset(cfg, "train")
        loader = BatchLoader(ds, 4, shuffle=True, seed=7, drop_last=True,
                             prefetch=0, num_workers=workers)
        loader.set_epoch(1)
        return list(loader)

    b0, b4 = batches(0), batches(4)
    assert len(b0) == len(b4) > 0
    for x, y in zip(b0, b4):
        assert x["ID"] == y["ID"]
        for k in x:
            if k != "ID":
                np.testing.assert_array_equal(x[k], y[k])


def test_loader_epoch_changes_augmentation():
    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 loss_point="Last", compute_dtype="float32",
                 learnablePrompt=0, batch_size=4, seed=7, bag_buckets=[128])
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=7)
    ds = syn.dataset(cfg, "train")
    ds.set_epoch(0)
    a = ds[0]["input_pathology"]
    ds.set_epoch(1)
    b = ds[0]["input_pathology"]
    # instance dropout draws differ across epochs → different kept rows
    assert a.shape != b.shape or not np.array_equal(a, b)
