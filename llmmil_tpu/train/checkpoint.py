"""Checkpointing: per-epoch saves, best-AUC copy, resume, partial restore.

Parity targets: ``utils.py:192-195`` (save_checkpoint + best copy),
``train_ddp.py:120-152`` (resume from {epoch, state_dict, optimizer}),
``train_ddp.py:154-185`` (per-branch pretrained-extractor restore by key
intersection + freezing).  TPU-native: Orbax PyTree checkpoints of
{step, params, opt_state, batch_stats}; branch restore merges a saved
params subtree into the live tree by path intersection.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _to_numpy(tree: Any) -> Any:
    # force a real host copy: on remote-tunneled backends a lazy np.asarray
    # view can reach orbax's serializer before the transfer materialises
    return jax.tree_util.tree_map(
        lambda x: np.array(jax.device_get(x)), tree)


def save_checkpoint(state: TrainState, save_dir: str, epoch: int,
                    is_best: bool = False) -> str:
    """checkpoint_{epoch:04d} + checkpoint_last (+ checkpoint_best copy)."""
    if jax.process_index() != 0:            # host-0 gating (train_ddp:211)
        return ""
    ckpt = {"epoch": epoch + 1,
            "params": _to_numpy(state.params),
            "opt_state": _to_numpy(state.opt_state),
            "batch_stats": _to_numpy(state.batch_stats or {})}
    saver = ocp.PyTreeCheckpointer()
    path = os.path.join(os.path.abspath(save_dir),
                        f"checkpoint_{epoch:04d}")
    saver.save(path, ckpt, force=True)
    last = os.path.join(os.path.abspath(save_dir), "checkpoint_last")
    if os.path.exists(last):
        shutil.rmtree(last)
    shutil.copytree(path, last)
    if is_best:
        best = os.path.join(os.path.abspath(save_dir), "checkpoint_best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return path


def load_checkpoint(path: str) -> dict:
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def resume(state: TrainState, path: str) -> tuple[TrainState, int]:
    """Restore params/opt_state/batch_stats + start epoch
    (train_ddp.py:124-143).  Restores against the live state's pytree
    structure so optax NamedTuple states come back typed."""
    template = {"epoch": 0,
                "params": _to_numpy(state.params),
                "opt_state": _to_numpy(state.opt_state),
                "batch_stats": _to_numpy(state.batch_stats or {})}
    ckpt = ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                            item=template)
    state = state.replace(params=ckpt["params"],
                          opt_state=ckpt["opt_state"],
                          batch_stats=ckpt.get("batch_stats", {}))
    return state, int(ckpt["epoch"])


def restore_branch(state: TrainState, ckpt_path: str,
                   branch: str) -> TrainState:
    """Merge a saved checkpoint's ``params[branch]`` subtree into the live
    params by key intersection (train_ddp.py:154-166 semantics: only keys
    present in both are copied)."""
    ckpt = load_checkpoint(ckpt_path)
    saved = ckpt["params"].get(branch)
    if saved is None:
        return state
    live = dict(state.params)

    def merge(dst, src):
        if not isinstance(dst, dict) or not isinstance(src, dict):
            return src if np.shape(dst) == np.shape(src) else dst
        out = dict(dst)
        for k in dst:
            if k in src:
                out[k] = merge(dst[k], src[k])
        return out

    live[branch] = merge(live[branch], saved)
    return state.replace(params=live)
