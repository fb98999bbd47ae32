#!/usr/bin/env python
"""Dataset-distribution t-SNE analysis.

Parity target: ``plot_TSNE_data_distribution.py`` — load each hospital's
test split, flatten raw per-modality features (CT voxels / padded bag rows /
clinical vectors) into one matrix, run t-SNE, and scatter internal
({AJMC,CNUH,PNUH}) vs external ({EUMC,HUMC,SCHMC}) cohorts into a PNG.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

INTERNAL = ["AJMC", "CNUH", "PNUH"]
EXTERNAL = ["EUMC", "HUMC", "SCHMC"]


def main(argv=None):
    from llmmil_tpu.config import create_arg_parser
    parser = create_arg_parser()
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--out", default="tsne.png")
    parser.add_argument("--max_per_hospital", type=int, default=32)
    ns = parser.parse_args(argv)

    import dataclasses
    from llmmil_tpu.config import Config
    names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in names})

    from llmmil_tpu.data import SyntheticCohort, MultimodalDataset
    from llmmil_tpu.data.bags import pad_bag

    feats, groups = [], []
    for hospitals, gname in ((INTERNAL, "internal"), (EXTERNAL, "external")):
        c = cfg.replace(hospital_test=hospitals)
        if ns.synthetic:
            ds = SyntheticCohort(c, n_per_hospital=8,
                                 seed=cfg.seed).dataset(c, "test")
        else:
            ds = MultimodalDataset(c, "test")
        for i in range(min(len(ds), ns.max_per_hospital * len(hospitals))):
            s = ds[i]
            if "input_pathology" in s:
                bag, _ = pad_bag(s["input_pathology"], 2048)
                feats.append(bag.ravel())
            elif "input_CT" in s:
                feats.append(np.asarray(s["input_CT"]).ravel())
            else:
                feats.append(np.asarray(s["input_CI"], np.float32).ravel())
            groups.append(gname)

    X = np.stack(feats)
    try:
        from sklearn.manifold import TSNE
        emb = TSNE(n_components=2, random_state=cfg.seed,
                   perplexity=min(30, len(X) - 1)).fit_transform(X)
    except ImportError:                                  # PCA fallback
        Xc = X - X.mean(0)
        _, _, vt = np.linalg.svd(Xc, full_matrices=False)
        emb = Xc @ vt[:2].T

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure(figsize=(6, 6))
    groups = np.asarray(groups)
    for g, color in (("internal", "tab:blue"), ("external", "tab:red")):
        m = groups == g
        plt.scatter(emb[m, 0], emb[m, 1], s=12, c=color, label=g,
                    alpha=0.7)
    plt.legend()
    plt.title("t-SNE of per-patient features (internal vs external)")
    plt.savefig(ns.out, dpi=200)
    print(f"saved {ns.out} ({len(X)} patients)")


if __name__ == "__main__":
    main()
