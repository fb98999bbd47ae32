#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact.

The TPU-native analogue of a TorchScript/ONNX deployment: the trained
variables are baked into multi-platform StableHLO (jax.export), one entry
per input signature (batch x bag bucket), so deployment needs neither the
model code nor the checkpoint (eval/export.py).  The reference instead
re-instantiates the torch module tree in-process (test_ddp.py:65-105).

Example:
  python scripts/export.py --modality "['pathology']" \
      --model_pathology ABMIL --aggregator ABMIL \
      --test_pth RUN_DIR/checkpoint_best.msgpack \
      --out model.llmmil --export_batch 1 --export_bags "[8192,15616]"

Validate a saved artifact against fresh inputs:
  python - <<'PY'
  from llmmil_tpu.eval.export import load_artifact
  m = load_artifact("model.llmmil"); print(m.signatures)
  PY
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    from llmmil_tpu.config import create_arg_parser

    parser = create_arg_parser()
    parser.add_argument("--out", required=True,
                        help="artifact output path")
    parser.add_argument("--export_batch", type=int, default=1)
    parser.add_argument("--export_bags", type=str, default="",
                        help="bag lengths to export entries for "
                             "(default: cfg.bag_buckets)")
    parser.add_argument("--export_ct_depth", type=int, default=160)
    parser.add_argument("--platforms", type=str, default="tpu,cpu")
    parser.add_argument("--cpu", action="store_true")
    ns = parser.parse_args(argv)

    import jax
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    from llmmil_tpu.config import Config
    names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in names})

    from llmmil_tpu.eval.export import (export_model, make_example_batch,
                                        save_artifact)
    from llmmil_tpu.models import build_model
    from llmmil_tpu.train import checkpoint as ckpt_lib
    from llmmil_tpu.train.state import create_train_state

    import ast
    bags = (ast.literal_eval(ns.export_bags) if ns.export_bags
            else (cfg.bag_buckets or [cfg.bag_max]))
    if isinstance(bags, int):
        bags = [bags]
    batches = ([make_example_batch(cfg, ns.export_batch, bag=b,
                                   ct_depth=ns.export_ct_depth)
                for b in bags] if "pathology" in cfg.modality else
               [make_example_batch(cfg, ns.export_batch,
                                   ct_depth=ns.export_ct_depth)])

    model = build_model(cfg)
    state = create_train_state(model, cfg, batches[0],
                               jax.random.PRNGKey(0), jit_init=True)
    if ns.test_pth:
        state = ckpt_lib.restore_for_eval(state, ns.test_pth)
        print(f"=> loaded checkpoint '{ns.test_pth}'")
    else:
        print("WARNING: no --test_pth given; exporting fresh-init weights")
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    platforms = tuple(p.strip() for p in ns.platforms.split(",") if p)
    blob = export_model(cfg, variables, batches, platforms=platforms)
    save_artifact(ns.out, blob)
    mb = len(blob) / 1e6
    print(f"=> wrote {ns.out} ({mb:.1f} MB, {len(batches)} "
          f"signature(s), platforms={list(platforms)})")
    return ns.out


if __name__ == "__main__":
    main()
