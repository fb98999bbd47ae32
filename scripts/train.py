#!/usr/bin/env python
"""Training CLI — the ``python train_ddp.py …`` equivalent.

All reference flags work (see llmmil_tpu/config.py); extras:
  --synthetic      train on the deterministic synthetic cohort (no data req)
  --cpu            force the CPU backend (debug)

Example (reference run_train.sh:81 analogue):
  python scripts/train.py --modality "['CT','pathology']" \
      --model_CI CLIP --CI_input_version text --aggregator TransMIL \
      --loss_point CT-Pth-Last --loss BCE+textCosSim
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    from llmmil_tpu.config import create_arg_parser

    parser = create_arg_parser()
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    ns = parser.parse_args(argv)

    import jax
    from llmmil_tpu.utils import enable_compile_cache
    enable_compile_cache()
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    from llmmil_tpu.config import Config
    import dataclasses
    names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in names})

    import numpy as np
    np.random.seed(cfg.seed)

    from llmmil_tpu.data import BatchLoader, MultimodalDataset, \
        SyntheticCohort
    from llmmil_tpu.parallel import ShardedEpochSampler
    from llmmil_tpu.train.loop import fit

    if ns.synthetic:
        syn = SyntheticCohort(cfg, n_per_hospital=8, seed=cfg.seed)
        train_ds = syn.dataset(cfg, "train")
        valid_ds = syn.dataset(cfg, "valid")
    else:
        train_ds = MultimodalDataset(cfg, "train")
        valid_ds = MultimodalDataset(cfg, "valid")

    sampler = ShardedEpochSampler(len(train_ds), shuffle=True,
                                  seed=cfg.seed)
    train_loader = BatchLoader(train_ds, cfg.batch_size, sampler=sampler,
                               num_workers=cfg.num_workers,
                               pool=cfg.loader_pool)
    valid_loader = BatchLoader(valid_ds, cfg.batch_size, shuffle=False,
                               num_workers=cfg.num_workers,
                               pool=cfg.loader_pool)

    summary = fit(cfg, train_loader, valid_loader,
                  profile_dir=cfg.profile_dir or None)
    print(f"best valid AUC: {summary['best_auc']:.4f} "
          f"(saved to {summary['save_dir']})")
    return summary


if __name__ == "__main__":
    main()
