"""Config.data_echo — data echoing (Choi et al. 2019, arXiv:1907.05550).

The measured host pipeline costs 749-1617 ms/sample against a 276 ms train
step (BENCH_NOTES r3): with too few loader cores the chip idles between
batches.  ``data_echo=N`` re-applies each loaded batch N times (fresh
dropout per echo via the step-counter rng fold-in), trading sample
diversity for utilization.  Beyond reference — the torch DataLoader path
has no equivalent.
"""

import os
import signal

import numpy as np

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, SyntheticCohort
from llmmil_tpu.train import checkpoint as ckpt_lib
from llmmil_tpu.train.loop import fit


def _cfg(tmp_path, **kw):
    base = dict(modality=["pathology"], model_pathology="ABMIL",
                aggregator="ABMIL", model_CI="simpleFCs_v1",
                CI_input_version="v1", loss_point="Last",
                compute_dtype="float32", learnablePrompt=0,
                batch_size=4, bag_buckets=[128, 256, 512],
                save_dir=str(tmp_path), n_epochs=1, save_best=False,
                log_every=100)
    base.update(kw)
    return Config(**base)


def _loaders(cfg, seed=41):
    syn = SyntheticCohort(cfg, n_per_hospital=8, seed=seed)
    tl = BatchLoader(syn.dataset(cfg, "train"), 4, shuffle=True,
                     drop_last=True, prefetch=0)
    vl = BatchLoader(syn.dataset(cfg, "valid"), 4, prefetch=0)
    return tl, vl


def test_echo_multiplies_optimizer_applications(tmp_path):
    cfg = _cfg(tmp_path, data_echo=3)
    tl, vl = _loaders(cfg)
    summary = fit(cfg, tl, vl, use_mesh=False)
    assert np.isfinite(summary["train"]["loss"])
    # one epoch of len(tl) loaded batches -> 3x optimizer steps
    raw = ckpt_lib.load_checkpoint(summary["save_dir"])
    assert raw["step"] == 3 * len(tl)
    # the resume offset counts LOADED batches (skip_next's unit)
    assert summary["train"]["n_batches"] == len(tl)


def test_echo_default_is_single_application(tmp_path):
    cfg = _cfg(tmp_path)
    assert cfg.data_echo == 1
    tl, vl = _loaders(cfg)
    summary = fit(cfg, tl, vl, use_mesh=False)
    raw = ckpt_lib.load_checkpoint(summary["save_dir"])
    assert raw["step"] == len(tl)


def test_echo_preemption_offset_counts_loaded_batches(tmp_path):
    """Mid-epoch resume must stay exact under echoing: the checkpoint's
    batch offset counts LOADED batches (what skip_next consumes), while
    the step counter counts echoed applications."""

    class _KillAfter:
        def __init__(self, loader, n):
            self.loader, self.n = loader, n

        def __len__(self):
            return len(self.loader)

        def set_epoch(self, e):
            self.loader.set_epoch(e)

        def skip_next(self, n):
            self.loader.skip_next(n)

        def first_batch(self):
            return self.loader.first_batch()

        def __iter__(self):
            for i, b in enumerate(self.loader):
                if i == self.n:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

    # device_prefetch=0: with the prefetch thread on, the SIGTERM (sent by
    # the loader while fetching AHEAD) can latch the guard before the main
    # loop reaches the batch, making the preemption point timing-dependent
    cfg = _cfg(tmp_path, data_echo=2, n_epochs=2, device_prefetch=0)
    tl, vl = _loaders(cfg)
    s1 = fit(cfg, _KillAfter(tl, n=1), vl, use_mesh=False)
    assert s1.get("preempted") is True
    raw = ckpt_lib.load_checkpoint(s1["save_dir"])
    assert raw["epoch"] == 0
    assert raw["batch_in_epoch"] == 2          # loaded batches applied
    assert raw["step"] == 4                    # 2 batches x 2 echoes

    ckpt = os.path.join(s1["save_dir"], "checkpoint_last.msgpack")
    tl2, _ = _loaders(cfg)
    s2 = fit(cfg.replace(resume=ckpt), tl2, vl, use_mesh=False)
    assert s2.get("preempted") is None
    raw2 = ckpt_lib.load_checkpoint(s2["save_dir"])
    # two full epochs of len(tl) batches, each applied twice
    assert raw2["step"] == 2 * 2 * len(tl2)
    assert raw2["epoch"] == 2
