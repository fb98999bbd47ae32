"""Checkpointing: per-epoch saves, best-AUC copy, resume, partial restore.

Parity targets: ``utils.py:192-195`` (save_checkpoint + best copy),
``train_ddp.py:120-152`` (resume from {epoch, state_dict, optimizer}),
``train_ddp.py:154-185`` (per-branch pretrained-extractor restore by key
intersection + freezing).

Format: single-file flax msgpack of {epoch, params, opt_state, batch_stats}.
(Orbax/tensorstore OCDBT was tried first but silently fails to finalise
checkpoints under paths containing the reference's run-dir characters
``()[]:`` — the per-process write lands, the top-level manifest merge never
happens, and restore dies with NOT_FOUND.  msgpack is path-agnostic, and at
this model scale (≤ a few hundred MB) a single file is also faster.)
"""

from __future__ import annotations

import os
import shutil
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from .state import TrainState


def _to_numpy(tree: Any) -> Any:
    # force a real host copy: on remote-tunneled backends a lazy np.asarray
    # view can reach the serializer before the transfer materialises
    return jax.tree_util.tree_map(
        lambda x: np.array(jax.device_get(x)), tree)


def _gather_tree(tree: Any) -> Any:
    """Assemble leaves that span processes (multi-host FSDP: a parameter
    sharded over hosts is not fully addressable on any one of them).

    COLLECTIVE when a gather is needed — every process must call it, so
    it runs *before* any ``jax.process_index() != 0`` gating.  A no-op in
    the single-process case (everything fully addressable)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if all(not isinstance(x, jax.Array) or x.is_fully_addressable
           for x in leaves):
        return tree
    from jax.experimental import multihost_utils

    def gather(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return multihost_utils.process_allgather(x, tiled=True)
        return x

    return jax.tree_util.tree_map(gather, tree)


def _ckpt_dict(state: TrainState, next_epoch: int,
               batch_in_epoch: int = 0) -> dict:
    return {"epoch": next_epoch,
            "step": int(state.step),
            "batch_in_epoch": int(batch_in_epoch),
            "params": state.params,
            "opt_state": state.opt_state,
            "batch_stats": state.batch_stats or {}}


def save_checkpoint(state: TrainState, save_dir: str, epoch: int,
                    is_best: bool = False,
                    next_epoch: int | None = None,
                    batch_in_epoch: int = 0) -> str:
    """checkpoint_{epoch:04d} + checkpoint_last (+ checkpoint_best copy),
    host-0 gated (train_ddp.py:211-244).

    ``next_epoch`` overrides the resume point (default ``epoch + 1``, the
    end-of-epoch convention); a mid-epoch preemption save passes ``epoch``
    plus ``batch_in_epoch`` = the number of train batches already applied,
    so --resume continues the interrupted epoch at the exact next batch
    (the loader order is deterministic per epoch — see
    ``BatchLoader.skip_next``)."""
    ne = epoch + 1 if next_epoch is None else next_epoch
    # gather BEFORE the rank gate — collective over processes when the
    # state is multi-host FSDP-sharded (no-op single-process)
    tree = _gather_tree(_ckpt_dict(state, ne, batch_in_epoch))
    if jax.process_index() != 0:
        return ""
    return _write_ckpt(_to_numpy(tree), save_dir, epoch, is_best)


def _write_ckpt(host_tree: dict, save_dir: str, epoch: int,
                is_best: bool) -> str:
    blob = serialization.to_bytes(host_tree)
    path = os.path.join(save_dir, f"checkpoint_{epoch:04d}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    shutil.copyfile(path, os.path.join(save_dir,
                                       "checkpoint_last.msgpack"))
    if is_best:
        shutil.copyfile(path, os.path.join(save_dir,
                                           "checkpoint_best.msgpack"))
    return path


class AsyncCheckpointer:
    """Overlap checkpoint I/O with training (beyond reference — the
    reference's ``torch.save`` blocks the epoch loop, utils.py:192-195).

    ``save_checkpoint`` snapshots the state ON DEVICE (one jitted copy
    program — new buffers, so the train loop's donated updates can't
    clobber them) and returns immediately; a worker thread then does the
    device→host fetch, msgpack serialization, and disk write.  Through the
    axon tunnel the d2h fetch of a production state is seconds — fully
    hidden behind the next epoch.  At most one save is in flight: a new
    save (or :meth:`wait`) joins the previous one first, and re-raises any
    error from it.  Call :meth:`wait` before reading the files or exiting.
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._exc: BaseException | None = None
        self._snapshot = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t))

    def save_checkpoint(self, state: TrainState, save_dir: str, epoch: int,
                        is_best: bool = False,
                        next_epoch: int | None = None,
                        batch_in_epoch: int = 0) -> str:
        self.wait()
        ne = epoch + 1 if next_epoch is None else next_epoch
        # scalars are fetched here (cheap); the array trees are copied on
        # device so the snapshot is immune to in-place (donated) updates
        meta = {"epoch": ne, "step": int(state.step),
                "batch_in_epoch": int(batch_in_epoch)}
        arrays = {"params": state.params,
                  "opt_state": state.opt_state,
                  "batch_stats": state.batch_stats or {}}
        if any(isinstance(x, jax.Array) and not x.is_fully_addressable
               for x in jax.tree_util.tree_leaves(arrays)):
            # multi-host FSDP: the gather is a collective — run it here
            # synchronously on EVERY process; only the write is async
            snap = _gather_tree(arrays)
        else:
            snap = self._snapshot(arrays)
        if jax.process_index() != 0:
            return ""
        path = os.path.join(save_dir, f"checkpoint_{epoch:04d}.msgpack")

        def work():
            try:
                # _to_numpy over the WHOLE dict (incl. the int meta fields)
                # keeps the file byte-identical to the synchronous path
                _write_ckpt(_to_numpy({**meta, **snap}), save_dir, epoch,
                            is_best)
            except BaseException as e:   # surfaced by the next wait()
                self._exc = e

        self._thread = threading.Thread(target=work, name="async-ckpt",
                                        daemon=True)
        self._thread.start()
        return path

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def _resolve(path: str) -> str:
    """Accept run dirs, stem names, or legacy dir-style paths."""
    if os.path.isdir(path):
        for cand in ("checkpoint_best.msgpack", "checkpoint_last.msgpack"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                return p
    if not path.endswith(".msgpack") and os.path.exists(path + ".msgpack"):
        return path + ".msgpack"
    return path


def load_checkpoint(path: str) -> dict:
    """Raw restore → nested plain dicts (no structure template)."""
    with open(_resolve(path), "rb") as f:
        return serialization.msgpack_restore(f.read())


def resume(state: TrainState, path: str) -> tuple[TrainState, int, int]:
    """Restore params/opt_state/batch_stats + step counter; returns
    ``(state, start_epoch, start_batch)`` (train_ddp.py:124-143, extended
    with the mid-epoch offset).

    Restores structure-free first so checkpoints written before the
    ``step``/``batch_in_epoch`` fields existed still load (missing fields
    default to 0 — the old epoch-granular behavior)."""
    with open(_resolve(path), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    template = {"params": state.params,
                "opt_state": state.opt_state,
                "batch_stats": state.batch_stats or {}}
    ckpt = serialization.from_state_dict(
        template, {k: raw[k] for k in template})
    state = state.replace(params=ckpt["params"],
                          opt_state=ckpt["opt_state"],
                          batch_stats=ckpt.get("batch_stats", {}),
                          # step feeds the train step's dropout fold-in;
                          # without it a resumed run would replay epoch-0
                          # dropout masks
                          step=int(raw.get("step", 0)))
    return state, int(raw["epoch"]), int(raw.get("batch_in_epoch", 0))


def restore_for_eval(state: TrainState, path: str) -> TrainState:
    """Restore ONLY params + batch_stats — the eval driver's loading path
    (test_ddp.py:118-127 loads just the model state_dict).

    Unlike :func:`resume`, no optimizer state is template-matched, so a
    checkpoint trained with a different optimizer configuration (e.g.
    ``grad_accum`` on, SGD-vs-Adam, different freeze masks — all of which
    reshape ``opt_state``) evaluates without having to repeat the training
    flags."""
    with open(_resolve(path), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    template = {"params": state.params,
                "batch_stats": state.batch_stats or {}}
    ckpt = serialization.from_state_dict(
        template, {k: raw[k] for k in template})
    return state.replace(params=ckpt["params"],
                         batch_stats=ckpt.get("batch_stats", {}))


def restore_branch(state: TrainState, ckpt_path: str,
                   branch: str) -> TrainState:
    """Merge a saved checkpoint's ``params[branch]`` subtree into the live
    params by key intersection (train_ddp.py:154-166 semantics: only keys
    present in both, with matching shapes, are copied)."""
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
