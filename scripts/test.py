#!/usr/bin/env python
"""Evaluation CLI — the ``python test_ddp.py …`` equivalent.

Loads ``--test_pth`` (a run dir containing checkpoint_best, or a checkpoint
path), runs external-hospital inference, selects/applies the decision
threshold (valid mode: Youden; test mode: --best_thres), writes the
per-patient table + ROC.png into a Predictions dir mirroring the SavedModels
layout (test_ddp.py:129-139).
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
    # depth-sharded CT serving (parallel/sp_ct.py): shard the volume's
    # depth axis over N devices — scales the reference's timed batch-1
    # metric (test_ddp.py:214-234) with chips; 0 = unsharded
    parser.add_argument("--artifact", type=str, default="",
                        help="serve from a jax.export artifact "
                             "(scripts/export.py) instead of model code "
                             "+ checkpoint")
    parser.add_argument("--export_artifact", type=str, default="",
                        help="also freeze this serving configuration "
                             "(plain or --ct_int8) as a jax.export "
                             "artifact at the given path")
    parser.add_argument("--ct_depth_shard", type=int, default=0)
    parser.add_argument("--ct_int8", type=int, default=0,
                        help="post-training int8 CT trunk, calibrated on "
                             "the first N volumes (eval/quant.py)")
    parser.add_argument("--nonct_int8", action="store_true",
                        help="also int8-quantize the non-CT dense stack "
                             "(TwoWay/TransMIL/CLIP GEMMs, "
                             "eval/quant_nonct.py); composes with "
                             "--ct_int8")
    parser.add_argument("--nystrom_assoc", action="store_true",
                        help="serve TransMIL's Nyström chain reassociated "
                             "as attn1·(pinv·(attn3·v)) — 3× fewer "
                             "N-major flops, float-exact to matmul "
                             "reassociation tolerance (ops/nystrom.py)")
    parser.add_argument("--attn_int8", action="store_true",
                        help="two-sided DYNAMIC int8 for the attention "
                             "score/value matmuls and the Nyström chain "
                             "(activation×activation GEMMs per-row/col "
                             "runtime scales, ops/dynquant.py); composes "
                             "with --ct_int8/--nonct_int8")
    parser.add_argument("--save_maps", action="store_true",
                        help="after evaluation, write --watch_ID's "
                             "interpretability map(s) per --map_type "
                             "(saliencyMap | gradCAM | pathologyAttn | "
                             "all) under <out_dir>/maps/ "
                             "(eval/saliency.py)")
    parser.add_argument("--eval_batch", type=int, default=1,
                        help="patients per device batch (beyond reference"
                             " — test_ddp.py:73 forces 1; probs are "
                             "batch-invariant, throughput is reported "
                             "as patients/s)")
    ns = parser.parse_args(argv)

    import jax
    from llmmil_tpu.utils import enable_compile_cache
    enable_compile_cache()
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    from llmmil_tpu.config import Config
    names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in names})

    from llmmil_tpu.data import BatchLoader, MultimodalDataset, \
        SyntheticCohort
    from llmmil_tpu.eval import evaluate

    mode = cfg.mode if cfg.mode in ("valid", "test") else "test"
    if ns.synthetic:
        syn = SyntheticCohort(cfg, n_per_hospital=8, seed=cfg.seed)
        ds = syn.dataset(cfg, mode)
    else:
        ds = MultimodalDataset(cfg, mode)
    loader = BatchLoader(ds, max(ns.eval_batch, 1), shuffle=False,
                         num_workers=cfg.num_workers)

    ckpt = None
    if cfg.test_pth:
        ckpt = cfg.test_pth        # run dir or checkpoint file (resolved)
        out_dir = (ckpt if os.path.isdir(ckpt) else os.path.dirname(ckpt)
                   ).replace("SavedModels", "Predictions")
        # record the tested stage subset in the path (test_ddp.py:130-131)
        out_dir = out_dir.replace(
            f"tr({cfg.cancerstageTrain})",
            f"tr({cfg.cancerstageTrain})te({cfg.cancerstageTest})")
    else:
        out_dir = os.path.join(cfg.save_dir, "Predictions", "untrained")

    if ns.save_maps and ns.artifact:
        raise SystemExit("--save_maps differentiates through the live "
                         "model; it can't combine with --artifact")
    res = evaluate(cfg, loader, checkpoint_path=ckpt, out_dir=out_dir,
                   mode=mode, ct_depth_shard=ns.ct_depth_shard,
                   ct_int8=ns.ct_int8, nonct_int8=ns.nonct_int8,
                   attn_int8=ns.attn_int8,
                   nystrom_assoc=ns.nystrom_assoc, artifact=ns.artifact,
                   export_artifact=ns.export_artifact,
                   return_state=ns.save_maps)
    if ns.save_maps:
        from llmmil_tpu.eval import save_patient_maps
        save_patient_maps(cfg, res["state"], loader, out_dir)
    print(f"AUC {res['auc']:.4f}  ACC {res['acc']:.4f}  "
          f"prec {res['precision']:.4f}  rec {res['recall']:.4f}  "
          f"thr {res['threshold']:.4f}  "
          f"{res['per_sample_time'] * 1e3:.1f} ms/patient  "
          f"{res['patients_per_sec']:.2f} patients/s "
          f"(batch {max(ns.eval_batch, 1)})")
    return res


if __name__ == "__main__":
    main()
