#!/usr/bin/env python
"""End-to-end host input-pipeline benchmark (VERDICT r2 #2).

The reference's CPU hot path (dataset.py:252-363: nii.gz decode → HU
normalise → crop/pad → bag load → collate) is SURVEY §7's named hard part;
this measures it at PRODUCTION size on THIS host, decomposed per stage, then
demonstrates loader/compute overlap (prefetch thread) at a size the host can
sustain.

Stages reported (ms/sample, median of --reps):
  nifti_decode     gzip + NIfTI parse of the stored CT volume
  packer           HU normalise + crop/pad (C++ native/packer.cc, else numpy)
  augment          train-time affine/noise/flip chain
  bag_load         np.load of the pathology feature bag
  dataset_item     full MultimodalDataset.__getitem__
  collate          pad-to-bucket + stack
  loader@wN        BatchLoader wall ms/sample at N workers (prefetch on)

Stage timings report min-of-reps (loads are deterministic; min rejects
contention outliers on this shared 1-core host).

Usage: python scripts/bench_input_pipeline.py [--n 8] [--depth 180]
         [--hw 560] [--bag 15616] [--workers 0,2,4] [--small] [--keep]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def materialize(root, n, depth, hw, bag_n, seed=0):
    """Reference on-disk layout (tests/test_real_files.py::_materialize),
    production-size volumes stored int16 like real rescaled CT."""
    import pandas as pd
    from llmmil_tpu.data.ct_io import write_nifti

    done = os.path.join(root, ".done")
    sig = f"{n}/{depth}/{hw}/{bag_n}"
    if os.path.exists(done) and open(done).read() == sig:
        return
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(seed)
    spacing = "X(0.6869)Y(0.6869)Z(3.0)"
    rows = []
    for i in range(n):
        patient, hosp = f"R{i:04d}", "AJMC"
        kind = "Biopsy" if i % 2 else "Resection"
        rows.append({
            "patientid": patient, "hospital": hosp,
            "pathologyimage": kind, "CT_before1": "(1, x, 1)",
            "CT ID mismatch": 0, "sex": "M", "sm": "N",
            "birth date": "1955-03-01",
            "locationcancer": 1, "cancerimaging": 2, "cancerimagingT": 2,
            "cancerimagingN": 1, "cancerimagingM": 0,
            "classification cancer": 1, "treatedate": "2010-01-01",
            "lastdate": "2016-06-01", "dead": 0, "deathsign": 1,
            "relapse": 0})
        ct_dir = os.path.join(root, "CT", spacing, hosp)
        os.makedirs(ct_dir, exist_ok=True)
        # realistic content: smooth structure + noise, int16 HU
        base = rs.rand(depth // 8 + 1, hw // 8 + 1, hw // 8 + 1)
        vol = np.kron(base, np.ones((8, 8, 8)))[:depth, :hw, :hw]
        vol = (vol * 1800 - 900 + rs.randn(depth, hw, hw) * 40
               ).astype(np.int16)
        write_nifti(os.path.join(ct_dir, patient + ".nii.gz"), vol)
        with open(os.path.join(ct_dir, patient + ".json"), "w") as f:
            json.dump({"RescaleSlope": 1.0, "RescaleIntercept": 0.0,
                       "PhotometricInterpretation": "MONOCHROME2",
                       "BitsStored": 12}, f)
        bag_dir = os.path.join(root, "Pathology", hosp, kind)
        os.makedirs(bag_dir, exist_ok=True)
        np.save(os.path.join(bag_dir, patient + ".npy"),
                rs.randn(bag_n, 768).astype(np.float32))
        print(f"materialized {patient}", file=sys.stderr, flush=True)
    excel_dir = os.path.join(root, "Clinical_excel")
    os.makedirs(excel_dir, exist_ok=True)
    pd.DataFrame(rows).to_csv(
        os.path.join(excel_dir, "Lung_Overall2.csv"), index=False)
    with open(done, "w") as f:
        f.write(sig)


def median_ms(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.min(ts))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--depth", type=int, default=180)
    p.add_argument("--hw", type=int, default=560)
    p.add_argument("--bag", type=int, default=15616)
    p.add_argument("--ct-shape", type=str, default="160,512,512")
    p.add_argument("--workers", type=str, default="0,2,4")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--root", type=str, default="/tmp/llmmil_pipe_bench")
    p.add_argument("--small", action="store_true")
    p.add_argument("--overlap", action="store_true",
                   help="also run the loader-vs-in-memory overlap demo")
    ns = p.parse_args(argv)
    if ns.small:
        ns.depth, ns.hw, ns.bag, ns.n = 24, 72, 256, 8
        ns.ct_shape = "16,64,64"

    from llmmil_tpu.config import Config
    from llmmil_tpu.data import BatchLoader, MultimodalDataset
    from llmmil_tpu.data import augment as aug
    from llmmil_tpu.data import native
    from llmmil_tpu.data.ct_io import (crop_or_pad_volume, hu_normalize,
                                       read_nifti)

    t0 = time.time()
    materialize(ns.root, ns.n, ns.depth, ns.hw, ns.bag)
    print(f"# materialize: {time.time() - t0:.0f}s", file=sys.stderr)

    d, h, _ = (int(v) for v in ns.ct_shape.split(","))
    cfg = Config(modality=["CT", "pathology"], model_CI="simpleFCs_v1",
                 CI_input_version="v1", batch_size=1, augmentation=1,
                 spacing=[0.6869, 0.6869, 3.0], ct_shape=[d, h, h],
                 ct_hw_override=h, bag_buckets=[ns.bag],
                 hospital_test=["EUMC", "HUMC", "SCHMC"],
                 path_data_CT=os.path.join(ns.root, "CT"),
                 path_data_pathology=os.path.join(ns.root, "Pathology"),
                 path_data_excel=os.path.join(ns.root, "Clinical_excel"),
                 learnablePrompt=0, num_workers=0)
    ds = MultimodalDataset(cfg, "train")   # kfold keeps 3/4 of the cohort
    assert len(ds) >= max(2, ns.n // 2), (len(ds), ns.n)
    row = ds.df.iloc[0]
    sx, sy, sz = cfg.spacing
    base = (f"{cfg.path_data_CT}/X({sx})Y({sy})Z({sz})/"
            f"{row['hospital']}/{row['patientid']}")
    results = {}

    img = read_nifti(base + ".nii.gz")
    results["nifti_decode"] = median_ms(
        lambda: read_nifti(base + ".nii.gz"), ns.reps)
    meta = json.load(open(base + ".json"))
    fused = native.hu_normalize_crop(img, meta, d, h)
    if fused is not None:
        results["packer"] = median_ms(
            lambda: native.hu_normalize_crop(img, meta, d, h), ns.reps)
    else:
        results["packer_numpy"] = median_ms(
            lambda: crop_or_pad_volume(hu_normalize(img, meta), d, h),
            ns.reps)
        fused = crop_or_pad_volume(hu_normalize(img, meta), d, h)
    # each augment op FORCED (prob=1.0): the chain's as-is timing hides
    # the probabilistic tails (rotate fires at p=0.2, noise at p=0.1) —
    # a "0.0 ms" augment reading masked ~0.45 s/sample of expected cost
    # in the first r3 run.  Expected chain cost ≈ 0.2·rotate + 0.1·noise
    # + 0.6·flip_pass (flip rebuilds contiguity when any axis fires).
    # decoded-CT cache (cfg.ct_cache_dir): hit = one raw np.load replacing
    # decode+packer
    cache_dir = os.path.join(ns.root, "ct_cache")
    ds_c = MultimodalDataset(cfg.replace(ct_cache_dir=cache_dir), "train")
    crow = ds_c.df.iloc[0]
    cpath = ds_c._ct_cache_path(crow)
    if not os.path.exists(cpath):
        ds_c._load_ct(crow, np.random.RandomState(0))    # populate
    results["ct_cache_hit"] = median_ms(
        lambda: np.load(cpath, mmap_mode=None), ns.reps)

    rng = np.random.RandomState(0)
    results["aug_rotate@p1"] = median_ms(
        lambda: aug.rand_rotate(fused, rng, prob=1.0), ns.reps)
    results["aug_noise@p1"] = median_ms(
        lambda: aug.rand_gaussian_noise(fused, rng, prob=1.0), ns.reps)
    results["aug_flip@p1"] = median_ms(
        lambda: aug.rand_flip(fused, rng, prob=1.0), ns.reps)
    results["augment_expect"] = (0.2 * results["aug_rotate@p1"]
                                 + 0.1 * results["aug_noise@p1"]
                                 + 0.6 * results["aug_flip@p1"])
    bagp = (f"{cfg.path_data_pathology}/{row['hospital']}/"
            f"{row['pathologyimage']}/{row['patientid']}.npy")
    results["bag_load"] = median_ms(
        lambda: np.load(bagp).astype(np.float32), ns.reps)
    results["ci_glue"] = median_ms(lambda: ds._load_ci(row), ns.reps)
    results["dataset_item"] = median_ms(lambda: ds[0], ns.reps)
    results["dataset_item+cache"] = median_ms(lambda: ds_c[0], ns.reps)
    samples = [ds[i] for i in range(min(2, len(ds)))]
    loader = BatchLoader(ds, 1, prefetch=0)
    results["collate"] = median_ms(lambda: loader._collate(samples),
                                   ns.reps)

    def drain_loader(dataset, w):
        """min over --reps epochs (this shared host shows 2-3x contention
        swings on multi-second walls; min is the uncontended figure)."""
        best = float("inf")
        for ep in range(ns.reps):
            ld = BatchLoader(dataset, 1, shuffle=False, prefetch=2,
                             num_workers=w)
            ld.set_epoch(ep)
            t0 = time.perf_counter()
            cnt = sum(1 for _ in ld)
            best = min(best, (time.perf_counter() - t0) * 1e3 / cnt)
        return best

    for w in (int(x) for x in ns.workers.split(",")):
        results[f"loader@w{w}"] = drain_loader(ds, w)
    for i in range(len(ds_c)):                      # populate all, then
        ds_c[i]                                     # measure the hit path
    results["loader@w1+cache"] = drain_loader(ds_c, 1)

    for k, v in results.items():
        print(f"{k:<16} {v:>10.1f} ms/sample", flush=True)

    if ns.overlap:
        overlap_demo(cfg, ds)


def overlap_demo(cfg, ds, num_workers=2):
    """Prefetch-overlap demonstration against a simulated device step.

    A jax-CPU stand-in step serializes with the loader on this 1-core host
    no matter how the prefetch is structured — that measures core
    contention, not pipeline overlap.  Production compute runs on the TPU
    and costs the host ~nothing (async dispatch + one h2d enqueue), so the
    faithful model is a GIL-releasing wait of t_step per batch.  Overlap
    is demonstrated when wall/step ≈ max(t_load, t_step) (pipelined)
    rather than t_load + t_step (serial).
    """
    from llmmil_tpu.data import BatchLoader

    def drain(step_s=0.0):
        t0 = time.perf_counter()
        n = 0
        for _ in BatchLoader(ds, 1, shuffle=False, prefetch=2,
                             num_workers=num_workers):
            if step_s:
                time.sleep(step_s)    # simulated TPU device step
            n += 1
        return (time.perf_counter() - t0) * 1e3 / n

    t_load = drain()
    print(f"overlap: bare loader {t_load:.0f} ms/sample "
          f"(w={num_workers}, prefetch=2)", flush=True)
    for step_ms in (250, int(t_load), int(2 * t_load)):
        wall = drain(step_ms / 1e3)
        ideal, serial = max(t_load, step_ms), t_load + step_ms
        print(f"overlap: step {step_ms:>5} ms -> wall {wall:>6.0f} ms/step "
              f"(pipelined bound {ideal:.0f}, serial bound {serial:.0f})",
              flush=True)


if __name__ == "__main__":
    main()
