#!/usr/bin/env python
"""Precompute WSI patch-feature bags with the CLIP ViT patch encoder.

The image-only WSI pipeline's production flow (BASELINE config #2): walk
``path_data_wsi/{hospital}/{Biopsy|Resection}/{pid}.{npy,png,jpg,...}``,
tile each slide, CLIP-preprocess, encode tile batches on the device
(data/wsi.py), and write ``(N, embed)`` bags to ``--out`` in the
reference's feature-store layout (``dataset.py:367``) — training then
consumes them with the default ``pathology_source='features'``.

Also the tiles/s benchmark for the patch encoder (one JSON line on
--bench_json; BENCH_NOTES "WSI patch encoding").

Examples:
  # encode a tree of slides with real CLIP weights
  python scripts/encode_wsi.py --path_data_wsi data/WSI \
      --patch_encoder_ckpt ViT-B-32.pt --out data/WSI_feature

  # synthetic tiles/s benchmark (random weights, generated slides)
  python scripts/encode_wsi.py --bench 8 --bench_slide 3584 --cpu
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SLIDE_EXTS = (".npy", ".png", ".jpg", ".jpeg", ".tif", ".tiff")


def _walk_slides(root):
    for hospital in sorted(os.listdir(root)):
        hdir = os.path.join(root, hospital)
        if not os.path.isdir(hdir):
            continue
        for kind in sorted(os.listdir(hdir)):
            kdir = os.path.join(hdir, kind)
            if not os.path.isdir(kdir):
                continue
            for f in sorted(os.listdir(kdir)):
                if f.lower().endswith(SLIDE_EXTS):
                    yield hospital, kind, os.path.splitext(f)[0], \
                        os.path.join(kdir, f)


def main(argv=None):
    from llmmil_tpu.config import create_arg_parser

    parser = create_arg_parser()
    parser.add_argument("--out", default="",
                        help="bag output root (reference feature-store "
                             "layout); default: path_data_pathology")
    parser.add_argument("--bench", type=int, default=0,
                        help="N: skip the walk, encode N synthetic "
                             "slides and report tiles/s")
    parser.add_argument("--bench_slide", type=int, default=3584,
                        help="synthetic slide side length (px)")
    parser.add_argument("--bench_json", action="store_true",
                        help="print one JSON line with the tiles/s")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    ns = parser.parse_args(argv)

    import jax
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    import numpy as np
    from llmmil_tpu.config import Config
    from llmmil_tpu.data.wsi import PatchEncoder

    names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in names})
    enc = PatchEncoder.from_config(cfg)
    print(f"patch encoder: {enc.vision_cfg} batch={enc.batch} "
          f"backend={jax.default_backend()}", flush=True)

    if ns.bench:
        rs = np.random.RandomState(0)
        side = ns.bench_slide
        n_tiles_slide = (side // cfg.wsi_tile) ** 2
        # warm-up must compile the program the timed loop actually runs:
        # uint8 slides at tile==px go through the raw uint8-input program
        # (device-side normalize), a DIFFERENT jit specialization from
        # float32 — warming only f32 would hide a multi-minute remote
        # compile inside the first timed iteration
        warm_dtype = np.uint8 if cfg.wsi_tile == cfg.wsi_px else np.float32
        enc(np.zeros((enc.batch, cfg.wsi_px, cfg.wsi_px, 3), warm_dtype))
        total_tiles, total_dev, t0 = 0, 0.0, time.perf_counter()
        for i in range(ns.bench):
            img = rs.randint(0, 256, (side, side, 3), dtype=np.uint8)
            td0 = time.perf_counter()
            bag, _ = enc.encode(img, tile=cfg.wsi_tile,
                                min_foreground=cfg.wsi_min_foreground)
            total_dev += time.perf_counter() - td0
            total_tiles += bag.shape[0]
        wall = time.perf_counter() - t0
        tps = total_tiles / total_dev
        print(f"{ns.bench} slides x {n_tiles_slide} tiles: "
              f"{total_tiles} tiles in {total_dev:.2f}s encode "
              f"({wall:.2f}s wall incl. synthesis) -> {tps:.1f} tiles/s",
              flush=True)
        if ns.bench_json:
            print(json.dumps({"metric": "wsi_tiles_per_sec",
                              "value": round(tps, 1), "unit": "tiles/s",
                              "slides": ns.bench,
                              "tile": cfg.wsi_tile}), flush=True)
        return

    out_root = ns.out or cfg.path_data_pathology
    n_done = n_skip = 0
    total_tiles, total_dev = 0, 0.0
    for hospital, kind, pid, path in _walk_slides(cfg.path_data_wsi):
        dst = os.path.join(out_root, hospital, kind, pid + ".npy")
        if os.path.exists(dst) and not ns.overwrite:
            n_skip += 1
            continue
        from llmmil_tpu.data.wsi import read_slide
        img = read_slide(path)
        t0 = time.perf_counter()
        bag, pos = enc.encode(img, tile=cfg.wsi_tile,
                              stride=cfg.wsi_stride or None,
                              min_foreground=cfg.wsi_min_foreground)
        dt = time.perf_counter() - t0
        total_tiles += bag.shape[0]
        total_dev += dt
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:       # handle write: np.save(path)
            np.save(f, bag)              # would append a second .npy
        os.replace(tmp, dst)
        n_done += 1
        print(f"{hospital}/{kind}/{pid}: {img.shape[:2]} -> "
              f"{bag.shape[0]} x {bag.shape[1]} in {dt:.2f}s", flush=True)
    rate = total_tiles / total_dev if total_dev else 0.0
    print(f"encoded {n_done} slides ({n_skip} cached), "
          f"{total_tiles} tiles, {rate:.1f} tiles/s", flush=True)


if __name__ == "__main__":
    main()
