"""AsyncCheckpointer (train/checkpoint.py) — overlapped checkpoint I/O.

Invariants:
- the async file is byte-identical to the synchronous save_checkpoint file;
- the on-device snapshot is immune to later in-place (donated) updates of
  the live state — the write captures the values at save time;
- worker-thread errors surface on wait(), not silently.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmmil_tpu.config import Config
from llmmil_tpu.models import build_model
from llmmil_tpu.train import checkpoint as ckpt_lib
from llmmil_tpu.train import create_train_state


def _tiny_state():
    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 CI_input_version="v1", loss_point="Last",
                 compute_dtype="float32", learnablePrompt=0)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    batch = {"input_pathology": jnp.asarray(rs.randn(2, 16, 768),
                                            jnp.float32),
             "mask_pathology": jnp.ones((2, 16), bool),
             "input_CI": jnp.asarray(rs.rand(2, 9), jnp.float32),
             "label": jnp.asarray(np.eye(2)[[0, 1]], jnp.float32)}
    return create_train_state(model, cfg, batch, jax.random.PRNGKey(0))


def test_async_file_matches_sync(tmp_path):
    state = _tiny_state()
    sdir, adir = tmp_path / "sync", tmp_path / "async"
    sdir.mkdir(), adir.mkdir()
    p_sync = ckpt_lib.save_checkpoint(state, str(sdir), epoch=3,
                                      is_best=True)
    acp = ckpt_lib.AsyncCheckpointer()
    p_async = acp.save_checkpoint(state, str(adir), epoch=3, is_best=True)
    acp.wait()
    assert os.path.basename(p_sync) == os.path.basename(p_async)
    for name in ("checkpoint_0003.msgpack", "checkpoint_last.msgpack",
                 "checkpoint_best.msgpack"):
        a = (sdir / name).read_bytes()
        b = (adir / name).read_bytes()
        assert a == b, f"{name} differs between sync and async saves"


def test_async_snapshot_survives_donation(tmp_path):
    """After save_checkpoint returns, donating (invalidating) the live
    param buffers must not corrupt the in-flight write — the snapshot was
    copied on device."""
    state = _tiny_state()
    want = jax.tree_util.tree_map(np.asarray, state.params)
    acp = ckpt_lib.AsyncCheckpointer()
    acp.save_checkpoint(state, str(tmp_path), epoch=0)
    # donate the live buffers, as fit()'s next train step would
    clobber = jax.jit(
        lambda t: jax.tree_util.tree_map(lambda x: x * 0 - 7.0, t),
        donate_argnums=0)
    _ = clobber(state.params)
    acp.wait()
    raw = ckpt_lib.load_checkpoint(str(tmp_path / "checkpoint_0000"))
    got_leaves = jax.tree_util.tree_leaves(raw["params"])
    want_leaves = jax.tree_util.tree_leaves(want)
    assert len(got_leaves) == len(want_leaves)
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_async_error_surfaces_on_wait(tmp_path):
    state = _tiny_state()
    acp = ckpt_lib.AsyncCheckpointer()
    acp.save_checkpoint(state, str(tmp_path / "does" / "not" / "exist"),
                        epoch=0)
    with pytest.raises(OSError):
        acp.wait()
    # the checkpointer is reusable after a failed save
    acp.save_checkpoint(state, str(tmp_path), epoch=1)
    acp.wait()
    assert (tmp_path / "checkpoint_0001.msgpack").exists()
