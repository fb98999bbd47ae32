#!/usr/bin/env python
"""Dataset-distribution t-SNE analysis — one embedding + PNG PER MODALITY.

Parity target: ``plot_TSNE_data_distribution.py:308-412`` — per hospital,
build SEPARATE feature matrices per modality (``get_data``: CT volumes
flattened, pathology bags zero-padded to a common width then flattened,
CI text-encoded through the CLIP clinic extractor), run one t-SNE per
modality over the hospital-concatenated matrix, and scatter with the
reference's [0,1]-rescaled coordinates (``scale_to_01_range``/
``plot_tsne``, :393-412) — grouped per hospital or internal vs external
(both plot variants exist in the reference, :230-289).

Outputs ``T-SNE(<modality>).png`` next to ``--out_dir`` plus the raw
embeddings as ``tsne_<modality>.npz`` (coords + hospital + group) so the
analysis is machine-checkable, not just a picture.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

INTERNAL = ["AJMC", "CNUH", "PNUH"]
EXTERNAL = ["EUMC", "HUMC", "SCHMC"]
# per-hospital colors (plot_TSNE_data_distribution.py:228), internal warm
# / external cool like the reference's Internal/External variant
HOSPITAL_COLORS = {
    "AJMC": "#1f77b4", "CNUH": "#ff7f0e", "PNUH": "#2ca02c",
    "EUMC": "#d62728", "HUMC": "#5d1371", "SCHMC": "#8c564b",
}


def scale_to_01_range(x):
    """plot_TSNE_data_distribution.py:393-402."""
    smooth = 1e-10
    return (x - np.min(x) + smooth) / (np.max(x) - np.min(x) + smooth)


def collect_modality_matrices(cfg, hospitals, synthetic=False,
                              max_per_hospital=0, bag_pad=None,
                              n_synth=8):
    """Per-modality matrices over the test split of each hospital.

    Returns ``(mats, hosp_of_row)`` where ``mats`` maps modality name →
    (N, F) float32 matrix (rows aligned across modalities); bags are
    zero-padded to ``bag_pad`` (default: longest observed) before
    flattening (get_data's fixed-width ``pathology_zip``, :327).
    """
    from llmmil_tpu.data import MultimodalDataset, SyntheticCohort

    per_mod = {m: [] for m in ("CT", "pathology", "CI")}
    hosp_of_row = []
    for hospital in hospitals:
        c = cfg.replace(hospital_test=[hospital])
        if synthetic:
            ds = SyntheticCohort(c, n_per_hospital=n_synth,
                                 seed=cfg.seed).dataset(c, "test")
        else:
            ds = MultimodalDataset(c, "test")
        n = len(ds)
        if max_per_hospital:
            n = min(n, max_per_hospital)
        for i in range(n):
            s = ds[i]
            if "input_CT" in s:
                per_mod["CT"].append(
                    np.asarray(s["input_CT"], np.float32).ravel())
            if "input_pathology" in s:
                per_mod["pathology"].append(
                    np.asarray(s["input_pathology"], np.float32))
            per_mod["CI"].append(np.asarray(s["input_CI"]))
            hosp_of_row.append(hospital)

    mats = {}
    if per_mod["CT"]:
        mats["CT"] = np.stack(per_mod["CT"])
    if per_mod["pathology"]:
        bags = per_mod["pathology"]
        width = bag_pad or max(b.shape[0] for b in bags)
        flat = np.zeros((len(bags), width * bags[0].shape[1]), np.float32)
        for i, b in enumerate(bags):       # zero-pad then flatten (:327)
            flat[i, :b.size] = b.ravel()
        mats["pathology"] = flat
    if per_mod["CI"]:
        mats["CI"] = _encode_ci(cfg, per_mod["CI"])
    return mats, np.asarray(hosp_of_row)


def _encode_ci(cfg, rows):
    """CI rows → (N, clip_embed) through the CLIP text tower (get_data
    encodes CI with a fresh ``CLIP(args)`` clinic extractor, :341,383 —
    NOT raw vectors); simpleFCs configs use their raw float vectors."""
    first = np.asarray(rows[0])
    if first.dtype.kind not in "iu":            # simpleFCs float vectors
        return np.stack([np.asarray(r, np.float32).ravel() for r in rows])
    import jax
    import jax.numpy as jnp

    from llmmil_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    tcfg = CLIPTextConfig(
        vocab_size=cfg.clip_vocab, context_length=cfg.clip_context,
        width=cfg.clip_width, heads=cfg.clip_heads,
        layers=cfg.clip_layers, embed_dim=cfg.clip_embed)
    enc = CLIPTextEncoder(tcfg)
    toks = jnp.asarray(np.stack(rows), jnp.int32)     # (N, P, T)
    n, p, t = toks.shape
    variables = enc.init(jax.random.PRNGKey(cfg.seed),
                         toks.reshape(-1, t)[:1])
    emb = jax.jit(enc.apply)(variables, toks.reshape(n * p, t))
    return np.asarray(emb.reshape(n, p, -1).mean(axis=1), np.float32)


def tsne_embed(X, seed=0):
    try:
        from sklearn.manifold import TSNE
        return TSNE(n_components=2, random_state=seed,
                    perplexity=min(30, len(X) - 1)).fit_transform(X)
    except ImportError:                                  # PCA fallback
        Xc = X - X.mean(0)
        _, _, vt = np.linalg.svd(Xc, full_matrices=False)
        return Xc @ vt[:2].T


def plot_modality(emb, hosp_of_row, out_png, title, group_by="hospital"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = scale_to_01_range(emb[:, 0])
    ys = scale_to_01_range(emb[:, 1])
    plt.figure(figsize=(6, 6))
    if group_by == "hospital":
        for h, color in HOSPITAL_COLORS.items():
            m = hosp_of_row == h
            if m.any():
                plt.scatter(xs[m], ys[m], s=12, c=color, label=h,
                            alpha=0.7)
    else:                                   # internal vs external (:284-289)
        internal = np.isin(hosp_of_row, INTERNAL)
        plt.scatter(xs[internal], ys[internal], s=12, c="#ff7f0e",
                    label="Internal", alpha=0.7)
        plt.scatter(xs[~internal], ys[~internal], s=12, c="#291fb4",
                    label="External", alpha=0.7)
    plt.legend(loc="best")
    plt.title(title)
    plt.savefig(out_png, dpi=200)
    plt.close()


def main(argv=None):
    from llmmil_tpu.config import create_arg_parser
    parser = create_arg_parser()
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--out_dir", default=".")
    parser.add_argument("--group_by", default="hospital",
                        choices=["hospital", "cohort"])
    parser.add_argument("--max_per_hospital", type=int, default=0,
                        help="0 = every patient in each split (the "
                             "reference analyses full cohorts)")
    parser.add_argument("--bag_pad", type=int, default=0,
                        help="fixed bag width before flattening "
                             "(0 = longest observed; the reference pins "
                             "15592, get_data:327)")
    ns = parser.parse_args(argv)

    import dataclasses
    from llmmil_tpu.config import Config
    names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in names})

    mats, hosp = collect_modality_matrices(
        cfg, INTERNAL + EXTERNAL, synthetic=ns.synthetic,
        max_per_hospital=ns.max_per_hospital, bag_pad=ns.bag_pad or None)

    os.makedirs(ns.out_dir, exist_ok=True)
    for modality, X in mats.items():
        emb = tsne_embed(X, seed=cfg.seed)
        png = os.path.join(ns.out_dir, f"T-SNE({modality}).png")
        plot_modality(emb, hosp, png,
                      f"t-SNE of raw {modality} features", ns.group_by)
        np.savez(os.path.join(ns.out_dir, f"tsne_{modality}.npz"),
                 coords=emb, hospital=hosp,
                 internal=np.isin(hosp, INTERNAL))
        print(f">> {modality}... Done! ({X.shape[0]} patients, "
              f"{X.shape[1]} dims) -> {png}")


if __name__ == "__main__":
    main()
