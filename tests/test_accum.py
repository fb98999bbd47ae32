"""Config.grad_accum — gradient accumulation via optax.MultiSteps.

Beyond reference: an N× effective batch without N× activation memory.
The invariant: ``grad_accum=N`` averages gradients over N micro-batches
and applies ONE inner-optimizer update equal to ``grad_accum=1`` fed the
averaged gradient (for mean-per-sample losses that average equals the
concatenated-batch gradient, up to per-application dropout noise —
which is why the pin is at the optax level, dropout-free).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, SyntheticCohort
from llmmil_tpu.train import checkpoint as ckpt_lib
from llmmil_tpu.train.loop import fit
from llmmil_tpu.train.optim import make_optimizer


def _cfg(tmp_path, **kw):
    base = dict(modality=["pathology"], model_pathology="ABMIL",
                aggregator="ABMIL", model_CI="simpleFCs_v1",
                CI_input_version="v1", loss_point="Last",
                compute_dtype="float32", learnablePrompt=0,
                batch_size=4, bag_buckets=[128],
                save_dir=str(tmp_path), n_epochs=1, save_best=False,
                log_every=100)
    base.update(kw)
    return Config(**base)


def test_accum_update_equals_single_step_on_averaged_grad(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3) / 7.0,
              "b": jnp.ones((3,)) * 0.3}
    g1 = {"w": jnp.full((2, 3), 0.2), "b": jnp.array([1.0, -1.0, 0.5])}
    g2 = {"w": jnp.full((2, 3), -0.6), "b": jnp.array([0.0, 2.0, 0.5])}
    gavg = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)

    # Adam branch (learnablePrompt=0): steps_per_epoch is in gradient
    # APPLICATIONS — 10 applications at accum=2 must see the same LR
    # trajectory as 5 updates at accum=1
    tx2 = make_optimizer(_cfg(tmp_path, grad_accum=2), steps_per_epoch=10)
    tx1 = make_optimizer(_cfg(tmp_path, grad_accum=1), steps_per_epoch=5)
    s2 = tx2.init(params)
    s1 = tx1.init(params)

    u, s2 = tx2.update(g1, s2, params)
    # accumulation-only micro-step: updates are exactly zero
    assert all(np.all(np.asarray(x) == 0.0)
               for x in jax.tree_util.tree_leaves(u))
    u2, s2 = tx2.update(g2, s2, params)
    u1, s1 = tx1.update(gavg, s1, params)
    for a, b in zip(jax.tree_util.tree_leaves(u2),
                    jax.tree_util.tree_leaves(u1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-6)

    # a second accumulation round keeps matching (inner count advanced once)
    u, s2 = tx2.update(g2, s2, optax.apply_updates(params, u2))
    u2b, s2 = tx2.update(g1, s2, optax.apply_updates(params, u2))
    u1b, s1 = tx1.update(gavg, s1, optax.apply_updates(params, u1))
    for a, b in zip(jax.tree_util.tree_leaves(u2b),
                    jax.tree_util.tree_leaves(u1b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-6)


def test_accum_fit_and_resume(tmp_path):
    """fit() with grad_accum runs end to end, checkpoints the MultiSteps
    accumulator, and resumes."""
    cfg = _cfg(tmp_path, grad_accum=2, n_epochs=2)
    syn = SyntheticCohort(cfg, n_per_hospital=8, seed=6)
    tl = BatchLoader(syn.dataset(cfg, "train"), 4, shuffle=True,
                     drop_last=True, prefetch=0)
    vl = BatchLoader(syn.dataset(cfg, "valid"), 4, prefetch=0)
    summary = fit(cfg, tl, vl, use_mesh=False)
    assert np.isfinite(summary["train"]["loss"])
    raw = ckpt_lib.load_checkpoint(summary["save_dir"])
    assert raw["step"] == 2 * len(tl)      # step counts micro-batches
    ckpt = os.path.join(summary["save_dir"], "checkpoint_last.msgpack")
    s2 = fit(cfg.replace(resume=ckpt, n_epochs=3), tl, vl, use_mesh=False)
    assert np.isfinite(s2["train"]["loss"])


def test_eval_restores_accum_checkpoint_without_training_flags(tmp_path):
    """A grad_accum-trained checkpoint has a MultiSteps-shaped opt_state;
    evaluate() must still load it under a default config (params +
    batch_stats only, like the reference's test driver) instead of
    demanding the training flags be repeated."""
    from llmmil_tpu.eval import evaluate

    cfg = _cfg(tmp_path, grad_accum=2, n_epochs=1)
    syn = SyntheticCohort(cfg, n_per_hospital=8, seed=8)
    tl = BatchLoader(syn.dataset(cfg, "train"), 4, shuffle=True,
                     drop_last=True, prefetch=0)
    vl = BatchLoader(syn.dataset(cfg, "valid"), 4, prefetch=0)
    summary = fit(cfg, tl, vl, use_mesh=False)
    ckpt = os.path.join(summary["save_dir"], "checkpoint_last.msgpack")

    plain = _cfg(tmp_path, mode="test", best_thres=0.5)   # no grad_accum
    assert plain.grad_accum == 1
    test_loader = BatchLoader(syn.dataset(plain, "test"), 4, prefetch=0)
    res = evaluate(plain, test_loader, checkpoint_path=ckpt,
                   out_dir=str(tmp_path / "pred"), mode="test")
    probs = res["table"]["prob"].to_numpy()
    assert np.all(np.isfinite(probs))
