#!/usr/bin/env python
"""Import a reference-trained torch checkpoint into this framework.

The reference's training loop saves ``{'state_dict': model.state_dict(),
...}`` of ``model/aggregator.py``'s ``aggregator`` (utils.py:192-195); this
tool converts that file into a flax msgpack checkpoint loadable by
``scripts/test.py --test_pth`` (restore_for_eval) and by the training
driver's branch restores — so a model trained with the reference serves
from this framework with identical fused-head numerics.

    python scripts/import_torch.py --checkpoint model_best.pth.tar \
        --out imported.msgpack [the config flags of the training run]

Pass the SAME model flags the reference run used (--modality, --model_CT,
--model_CI, --aggregator, ...): the converter validates the state dict
against that architecture and fails loudly on drift.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _tiny_batch(cfg):
    """Smallest batch that traces every branch of this configuration."""
    import jax.numpy as jnp
    rs = np.random.RandomState(0)
    batch = {}
    if "CT" in cfg.modality:
        batch["input_CT"] = jnp.asarray(
            rs.rand(1, 8, 32, 32, 1), jnp.float32)
        if "wMask" in cfg.model_CT:
            # without this the wMask trunks init a 1-channel stem (the
            # mask concat is batch-keyed) and the reference's 2-channel
            # weights would fail shape validation
            batch["mask_CT"] = jnp.asarray(
                (rs.rand(1, 8, 32, 32, 1) > 0.5), jnp.float32)
    if "pathology" in cfg.modality:
        batch["input_pathology"] = jnp.asarray(
            rs.rand(1, 12, 768), jnp.float32)
    if cfg.model_CI == "CLIP":
        toks = np.zeros((1, cfg.n_clinical + 1, cfg.clip_context), np.int32)
        toks[:, :, 0] = 1
        toks[:, :, 12] = 2          # a fake EOT position past the ctx splice
        batch["input_CI"] = jnp.asarray(toks)
    else:
        n = {"simpleFCs_v1": cfg.n_clinical,
             "simpleFCs_v1d": cfg.n_clinical *
             int(np.ceil(512 / cfg.n_clinical)),
             "simpleFCs_v2": 27, "simpleFCs_v2d": 27 * 19}[cfg.model_CI]
        batch["input_CI"] = jnp.asarray(rs.rand(1, n), jnp.float32)
    return batch


def main(argv=None):
    from llmmil_tpu.config import create_arg_parser

    parser = create_arg_parser()
    parser.add_argument("--checkpoint", required=True,
                        help="reference torch checkpoint (.pth/.pth.tar)")
    parser.add_argument("--out", required=True,
                        help="output flax checkpoint (.msgpack)")
    parser.add_argument("--cpu", action="store_true")
    ns = parser.parse_args(argv)

    import jax
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    import torch
    from flax import serialization

    from llmmil_tpu.config import Config
    from llmmil_tpu.models.aggregator import build_model
    from llmmil_tpu.models.migrate import merge_reference_checkpoint

    names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in names})

    ckpt = torch.load(ns.checkpoint, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt

    model = build_model(cfg)
    batch = _tiny_batch(cfg)
    variables = model.init(jax.random.PRNGKey(cfg.seed), batch)

    merged, report = merge_reference_checkpoint(dict(variables), sd, cfg)
    print(f"converted: {len(report['dropped'])} dead reference keys "
          f"dropped, {len(report['fresh'])} leaves left at init")
    for k in report["fresh"]:
        print(f"  fresh (no reference analog): {k}")

    host = jax.tree_util.tree_map(np.asarray, merged)
    out = {"epoch": 0, "step": 0, "batch_in_epoch": 0,
           "params": host["params"],
           "batch_stats": host.get("batch_stats", {})}
    os.makedirs(os.path.dirname(os.path.abspath(ns.out)), exist_ok=True)
    with open(ns.out, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"wrote {ns.out}")


if __name__ == "__main__":
    main()
