"""Training driver: the epoch loop.

Parity target: ``train_ddp.py:199-244`` (epoch loop: sampler.set_epoch, LR
adjust, train, valid, best-AUC checkpointing) + ``train_ddp.py:246-513``
(per-batch metering, epoch-end scalars).  Differences by design:

- the whole batch body is ONE jitted XLA program (forward+backward+update);
- AUC is computed on P(class 1) over the full epoch (the reference feeds
  *argmax* predictions to roc_auc_score, train_ddp.py:368 — recorded here
  additionally as ``auc_argmax`` for comparison, SURVEY §5 calls this a
  behavior to improve, not replicate);
- batches arrive bucket-padded with masks; each bag bucket compiles once.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..models import build_model
from ..parallel import make_mesh, replicate, shard_batch
from ..parallel.prefetch import prefetch_to_device
from ..utils import AverageMeter, MetricWriter, ProgressMeter
from ..utils.run_dir import dump_config, make_save_dir
from . import checkpoint as ckpt_lib
from .metrics import accuracy_onehot, precision_recall, roc_auc
from .preempt import PreemptionGuard
from .state import create_train_state
from .step import make_eval_step, make_train_step


def _device_batch(batch: Dict, mesh) -> Dict:
    arrays = {k: v for k, v in batch.items() if k != "ID"}
    if mesh is not None:
        return shard_batch(arrays, mesh)
    return arrays


def _epoch_metrics(all_probs, all_labels, num_classes: int) -> Dict:
    if not all_probs:            # zero batches ran (preempted immediately)
        return {"acc": 0.0, "auc": 0.0, "precision": 0.0, "recall": 0.0}
    probs = np.concatenate(all_probs)
    labels = np.concatenate(all_labels)
    y = np.argmax(labels, -1)
    preds = np.argmax(probs, -1)
    out = {"acc": float((preds == y).mean())}
    if num_classes == 2:
        out["auc"] = roc_auc(y, probs[:, 1])
        out["auc_argmax"] = roc_auc(y, preds)        # reference behavior
        prec, rec = precision_recall(y, preds, "binary")
    else:
        from .metrics import roc_auc_ovo_macro
        prec, rec = precision_recall(y, preds, "macro")
        out["auc"] = roc_auc_ovo_macro(y, probs)     # train_ddp.py:365-368
    out["precision"], out["recall"] = float(prec), float(rec)
    return out


def run_epoch(step_fn, state, loader, mesh, rng, epoch: int, cfg: Config,
              train: bool, writer: Optional[MetricWriter] = None,
              guard: Optional[PreemptionGuard] = None):
    """One pass over a loader; returns (state, epoch metrics).

    ``guard``: a latched :class:`PreemptionGuard` drains pending metrics and
    breaks the batch loop at the next step boundary."""
    batch_time = AverageMeter("Time", ":6.3f")
    data_time = AverageMeter("Data", ":6.3f")
    losses = AverageMeter("Loss", ":.4e")
    accs = AverageMeter("Acc", ":6.2f")
    prefix = "Train" if train else "Valid"
    progress = ProgressMeter(len(loader), [batch_time, data_time, losses,
                                           accs], prefix=f"{prefix} "
                             f"Epoch: [{epoch}]")
    term_meters: Dict[str, AverageMeter] = {}
    all_probs, all_labels = [], []
    pending = []                 # device-side metrics, drained lazily

    def drain():
        # fetching scalars forces a host<->device sync (~30 ms through the
        # tunnel); batching the fetches every ``log_every`` steps lets XLA
        # pipeline the dispatches instead of stalling once per batch
        for n_, m_, label_ in pending:
            losses.update(float(m_["loss"]), n_)
            accs.update(float(m_["acc"]), n_)
            for k in ("loss_CT", "loss_Pth", "loss_Last", "loss_CosSim"):
                if k in m_:
                    term_meters.setdefault(
                        k, AverageMeter(k, ":.4e")).update(float(m_[k]), n_)
            all_probs.append(np.asarray(m_["probs"]))
            all_labels.append(np.asarray(label_))
        pending.clear()

    epoch_start = time.time()
    end = time.time()
    n_batches = 0
    batches = loader
    if cfg.device_prefetch > 0:
        # background device_put pipeline: the h2d copy of batch i+1 overlaps
        # the jitted step for batch i (parallel/prefetch.py); _device_batch
        # below is then a no-copy no-op on the already-placed arrays
        batches = prefetch_to_device(loader, cfg.device_prefetch, mesh)
    for i, batch in enumerate(batches):
        data_time.update(time.time() - end)
        # prefetched batches carry the original host-side label so the
        # metric drain never pays a per-batch d2h fetch
        host_label = batch.pop("_host_label", batch["label"])
        n = host_label.shape[0]
        n_batches += 1
        db = _device_batch(batch, mesh)
        if train:
            # data echoing (Config.data_echo): re-apply the loaded batch so
            # the chip isn't idle while the host pipeline assembles the
            # next one; each echo's dropout differs (step-counter fold-in).
            # getattr: tolerate configs predating the field
            for _ in range(max(int(getattr(cfg, "data_echo", 1)), 1)):
                state, metrics = step_fn(state, db, rng)
                pending.append((n, metrics, host_label))
        else:
            metrics = step_fn(state, db)
            pending.append((n, metrics, host_label))
        batch_time.update(time.time() - end)
        end = time.time()
        if i % cfg.log_every == 0:
            drain()
            progress.display(i)
        if guard is not None and guard.requested:
            break
    drain()

    em = _epoch_metrics(all_probs, all_labels, cfg.num_classes)
    em["loss"] = losses.avg
    # throughput observability (the reference only prints per-batch meters,
    # SURVEY §5) — epoch wall-clock step time and samples/s in the scalars
    wall = time.time() - epoch_start
    if n_batches:
        em["step_ms"] = 1e3 * wall / n_batches
        em["samples_per_s"] = losses.count / wall if wall else 0.0
    for k, m in term_meters.items():
        em[k] = m.avg
    if writer is not None:
        writer.add_scalars(em, epoch, prefix=("train/" if train
                                              else "valid/"))
    # after the writer: a batch count is bookkeeping for the preemption
    # save (mid-epoch resume offset), not a metric scalar
    em["n_batches"] = n_batches
    return state, em


def fit(cfg: Config, train_loader, valid_loader,
        save_dir: Optional[str] = None, use_mesh: bool = True,
        n_epochs: Optional[int] = None, profile_dir: Optional[str] = None
        ) -> Dict:
    """Full training run; returns summary dict with best valid AUC.

    ``profile_dir`` enables a jax.profiler trace of the first training epoch
    (the reference's only tracing is wall-clock meters, SURVEY §5)."""
    from ..config import resolve_memory_config
    cfg = resolve_memory_config(cfg, training=True)
    save_dir = save_dir or make_save_dir(cfg)
    dump_config(cfg, save_dir)
    writer = MetricWriter(save_dir)

    model = build_model(cfg)
    first = (train_loader.first_batch() if hasattr(train_loader,
                                                   "first_batch")
             else next(iter(train_loader)))
    init_batch = {k: v for k, v in first.items() if k != "ID"}
    rng = jax.random.PRNGKey(cfg.seed)
    # data echoing multiplies optimizer steps per epoch — the LR schedule
    # horizon must count applications, not loaded batches
    echo = max(int(getattr(cfg, "data_echo", 1)), 1)
    state = create_train_state(model, cfg, init_batch, rng,
                               steps_per_epoch=len(train_loader) * echo,
                               jit_init=True)

    start_epoch = cfg.start_epoch
    resume_batch = 0
    if cfg.resume:
        state, start_epoch, resume_batch = ckpt_lib.resume(state,
                                                           cfg.resume)
        print(f"=> resumed from '{cfg.resume}' (epoch {start_epoch}"
              + (f", batch {resume_batch}" if resume_batch else "") + ")")
    else:
        for flag, path, branch in (
                (cfg.pretrainedExt_CT, cfg.pretrainedExt_CT_pth,
                 "extractor_CT"),
                (cfg.pretrainedExt_pathology,
                 cfg.pretrainedExt_pathology_pth, "extractor_pathology"),
                (cfg.pretrainedExt_CI, cfg.pretrainedExt_CI_pth,
                 "clinic_extractor")):
            if flag and path:
                state = ckpt_lib.restore_branch(state, path, branch)
                print(f"=> loaded pretrained {branch} from {path}")

    mesh = None
    state_shardings = None
    if use_mesh and jax.device_count() > 1:
        mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
        tp_ax = getattr(cfg, "tp_axis", "")
        ep_ax = getattr(cfg, "ep_axis", "")
        if tp_ax and ep_ax and tp_ax != ep_ax:
            raise ValueError(
                "tp_axis and ep_axis compose only over the SAME mesh "
                "axis (experts shard dim 0 alongside the Megatron rules "
                "— parallel/ep.py); got different axes "
                f"{tp_ax!r} vs {ep_ax!r}")
        if tp_ax:
            # Megatron-pattern tensor parallelism (optionally + MoE
            # expert parallelism on the same axis, + FSDP on the
            # remaining dims): path-keyed annotations, disjoint rule
            # sets merged into one pass
            from ..parallel.ep import EP_RULES
            from ..parallel.tp import DEFAULT_TP_RULES, shard_state_tp
            rules = DEFAULT_TP_RULES + (EP_RULES if ep_ax else ())
            state, state_shardings = shard_state_tp(
                state, mesh, tp_ax, rules=rules,
                fsdp_axis=getattr(cfg, "fsdp_axis", "") or None)
        elif getattr(cfg, "ep_axis", ""):
            # expert parallelism for the MoE FFN params (parallel/ep.py)
            from ..parallel.ep import shard_state_ep
            state, state_shardings = shard_state_ep(
                state, mesh, cfg.ep_axis,
                fsdp_axis=getattr(cfg, "fsdp_axis", "") or None)
        elif getattr(cfg, "fsdp_axis", ""):
            # FSDP: shard params/opt-state over the axis (ZeRO-3); XLA
            # all-gathers params before use and reduce-scatters grads
            from ..parallel.fsdp import shard_state
            state, state_shardings = shard_state(state, mesh,
                                                 cfg.fsdp_axis)
        else:
            state = replicate(state, mesh)

    # donate the incoming state: the loop rebinds it every step, and
    # donation lets XLA update params/opt-state in place (no extra copy
    # of the ~350 MB param set at production size)
    train_step = make_train_step(cfg, donate=True, mesh=mesh,
                                 state_shardings=state_shardings)
    eval_step = make_eval_step(cfg)

    best_auc = 0.0
    summary: Dict = {}
    # saver quacks like the module: AsyncCheckpointer overlaps the d2h
    # fetch + disk write with the next epoch (Config.async_checkpoint)
    saver = (ckpt_lib.AsyncCheckpointer()
             if getattr(cfg, "async_checkpoint", 0) else ckpt_lib)
    guard = (PreemptionGuard() if cfg.handle_preemption
             else PreemptionGuard(signals=()))
    with guard:
        for epoch in range(start_epoch, n_epochs or cfg.n_epochs):
            train_loader.set_epoch(epoch)
            print(save_dir)
            # mid-epoch resume: skip the batches the preempted run already
            # applied (deterministic order per set_epoch).  Loaders without
            # the hook fall back to re-running the whole epoch (harmless).
            epoch_offset = 0
            if epoch == start_epoch and resume_batch:
                if hasattr(train_loader, "skip_next"):
                    train_loader.skip_next(resume_batch)
                    epoch_offset = resume_batch
                    print(f"=> mid-epoch resume: skipping the "
                          f"{resume_batch} already-trained batches")
                else:
                    print("=> loader has no skip_next hook; re-running "
                          "the interrupted epoch from batch 0")
            if profile_dir and epoch == start_epoch:
                with jax.profiler.trace(profile_dir):
                    state, tm = run_epoch(train_step, state, train_loader,
                                          mesh, rng, epoch, cfg, train=True,
                                          writer=writer, guard=guard)
            else:
                state, tm = run_epoch(train_step, state, train_loader, mesh,
                                      rng, epoch, cfg, train=True,
                                      writer=writer, guard=guard)
            if guard.requested:
                # preempted mid-epoch: persist progress as checkpoint_last
                # with the exact batch offset so --resume continues the
                # interrupted epoch at the next batch (no replayed or
                # skipped samples).  Preemption on the last batch counts
                # as a completed epoch (validation is sacrificed, as in
                # the preempt-during-validation path below).
                done = epoch_offset + tm["n_batches"]
                if done >= len(train_loader):
                    saver.save_checkpoint(state, save_dir, epoch,
                                             is_best=False)
                else:
                    saver.save_checkpoint(state, save_dir, epoch,
                                             is_best=False,
                                             next_epoch=epoch,
                                             batch_in_epoch=done)
                summary = {"epoch": epoch, "train": tm, "best_auc": best_auc,
                           "save_dir": save_dir, "preempted": True}
                print(f"=> preemption: checkpointed epoch {epoch} at batch "
                      f"{done}/{len(train_loader)}, exiting")
                break
            _, vm = run_epoch(eval_step, state, valid_loader, mesh, rng,
                              epoch, cfg, train=False, writer=writer,
                              guard=guard)
            if guard.requested:
                # preempted during validation: the train epoch completed,
                # so --resume continues at epoch+1; the truncated valid
                # metrics must not drive best-AUC selection
                saver.save_checkpoint(state, save_dir, epoch,
                                         is_best=False)
                summary = {"epoch": epoch, "train": tm, "best_auc": best_auc,
                           "save_dir": save_dir, "preempted": True}
                print(f"=> preemption during validation: checkpointed "
                      f"epoch {epoch}, exiting")
                break
            is_best = vm["auc"] >= best_auc
            if is_best:
                best_auc = vm["auc"]
            if (not cfg.save_best) or is_best:
                saver.save_checkpoint(state, save_dir, epoch,
                                         is_best=is_best)
            summary = {"epoch": epoch, "train": tm, "valid": vm,
                       "best_auc": best_auc, "save_dir": save_dir}
    if hasattr(saver, "wait"):
        saver.wait()      # flush the in-flight async save (and its errors)
    writer.close()
    return summary
