"""End-to-end real-file data path: CSV cohort + .nii.gz CT + .npy bags +
metadata JSON on disk → build_cohort → MultimodalDataset → BatchLoader."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.data import BatchLoader, MultimodalDataset
from llmmil_tpu.data.ct_io import write_nifti


HOSP = ["AJMC", "CNUH", "PNUH", "EUMC"]


def _materialize(root, n_per_hosp=3, seed=0):
    rs = np.random.RandomState(seed)
    rows = []
    spacing = "X(2.0)Y(2.0)Z(2.5)"
    pid = 0
    for hosp in HOSP:
        for _ in range(n_per_hosp):
            patient = f"R{pid:04d}"
            pid += 1
            kind = "Biopsy" if rs.rand() < 0.5 else "Resection"
            dead = int(rs.rand() < 0.5)
            rows.append({
                "patientid": patient, "hospital": hosp,
                "pathologyimage": kind, "CT_before1": "(1, x, 1)",
                "CT ID mismatch": 0,
                "sex": "M" if rs.rand() < 0.5 else "F",
                "sm": "N" if rs.rand() < 0.5 else "Y",
                "birth date": "1955-03-01",
                "locationcancer": int(rs.randint(1, 6)),
                "cancerimaging": int(rs.randint(1, 5)),
                "cancerimagingT": int(rs.randint(1, 5)),
                "cancerimagingN": int(rs.randint(0, 4)),
                "cancerimagingM": int(rs.randint(0, 2)),
                "classification cancer": int(rs.randint(1, 3)),
                "treatedate": "2010-01-01",
                "lastdate": "2016-06-01" if not dead else "2012-01-01",
                "dead": dead, "deathsign": 1, "relapse": 0,
            })
            ct_dir = os.path.join(root, "CT", spacing, hosp)
            os.makedirs(ct_dir, exist_ok=True)
            vol = (rs.rand(12, 40, 40) * 2000 - 1000).astype(np.float32)
            write_nifti(os.path.join(ct_dir, patient + ".nii.gz"), vol)
            with open(os.path.join(ct_dir, patient + ".json"), "w") as f:
                json.dump({"RescaleSlope": 1.0, "RescaleIntercept": 0.0,
                           "PhotometricInterpretation": "MONOCHROME2",
                           "BitsStored": 12}, f)
            bag_dir = os.path.join(root, "Pathology", hosp, kind)
            os.makedirs(bag_dir, exist_ok=True)
            np.save(os.path.join(bag_dir, patient + ".npy"),
                    rs.randn(int(rs.randint(30, 90)), 768
                             ).astype(np.float32))
    excel_dir = os.path.join(root, "Clinical_excel")
    os.makedirs(excel_dir, exist_ok=True)
    pd.DataFrame(rows).to_csv(
        os.path.join(excel_dir, "Lung_Overall2.csv"), index=False)


def test_real_file_pipeline(tmp_path):
    root = str(tmp_path)
    _materialize(root)
    cfg = Config(modality=["CT", "pathology"], model_CI="simpleFCs_v1",
                 CI_input_version="v1", batch_size=2, augmentation=1,
                 spacing=[2.0, 2.0, 2.5], ct_shape=[12, 40, 40],
                 ct_hw_override=40, bag_buckets=[128],
                 hospital_test=["EUMC", "HUMC", "SCHMC"],
                 path_data_CT=os.path.join(root, "CT"),
                 path_data_pathology=os.path.join(root, "Pathology"),
                 path_data_excel=os.path.join(root, "Clinical_excel"),
                 learnablePrompt=0)
    ds = MultimodalDataset(cfg, "train")
    assert len(ds) > 0
    s = ds[0]
    assert s["input_CT"].shape == (12, 40, 40, 1)
    assert 0.0 <= float(s["input_CT"].min()) \
        and float(s["input_CT"].max()) <= 1.0
    assert s["input_pathology"].shape[1] == 768
    assert s["input_CI"].shape == (9,)

    loader = BatchLoader(ds, 2, shuffle=True, drop_last=True)
    batch = next(iter(loader))
    assert batch["input_CT"].shape == (2, 12, 40, 40, 1)
    assert batch["input_pathology"].shape == (2, 128, 768)
    assert batch["mask_pathology"].sum() > 0

    # test split reads the held-out hospital only
    ds_test = MultimodalDataset(cfg, "test")
    assert set(ds_test.df["hospital"]) <= {"EUMC", "HUMC", "SCHMC"}


def test_ct_cache_roundtrip(tmp_path):
    """Decoded-CT cache: miss populates, hit is byte-identical and skips
    the nii.gz entirely (the source file is removed before the hit)."""
    root = str(tmp_path)
    _materialize(root)
    cache = os.path.join(root, "ct_cache")
    cfg = Config(modality=["CT", "pathology"], model_CI="simpleFCs_v1",
                 CI_input_version="v1", batch_size=1, augmentation=0,
                 spacing=[2.0, 2.0, 2.5], ct_shape=[12, 40, 40],
                 ct_hw_override=40, bag_buckets=[128],
                 hospital_test=["EUMC", "HUMC", "SCHMC"],
                 path_data_CT=os.path.join(root, "CT"),
                 path_data_pathology=os.path.join(root, "Pathology"),
                 path_data_excel=os.path.join(root, "Clinical_excel"),
                 learnablePrompt=0, ct_cache_dir=cache)
    ds = MultimodalDataset(cfg, "train")
    miss = ds[0]["input_CT"]
    row = ds.df.iloc[0]
    cpath = ds._ct_cache_path(row)
    assert os.path.exists(cpath), cpath
    # remove the source volume: the hit path must not need it
    sx, sy, sz = cfg.spacing
    src = (f"{cfg.path_data_CT}/X({sx})Y({sy})Z({sz})/"
           f"{row['hospital']}/{row['patientid']}.nii.gz")
    os.remove(src)
    hit = ds[0]["input_CT"]
    assert (miss == hit).all()
    # a different ct_shape keys a different cache file
    ds2 = MultimodalDataset(cfg.replace(ct_shape=[8, 40, 40]), "train")
    assert ds2._ct_cache_path(ds2.df.iloc[0]) != cpath


# ---- reference on-disk formats: DICOM header + NRRD masks ------------------

def test_dicom_tag_roundtrip(tmp_path):
    from llmmil_tpu.data import read_dicom_tags, write_dicom_ct_header
    for implicit in (False, True):
        p = str(tmp_path / f"hdr_{implicit}.dcm")
        write_dicom_ct_header(
            p, rescale_slope=2.0, rescale_intercept=-1024.0,
            photometric="MONOCHROME1", bits_stored=16, implicit=implicit)
        meta = read_dicom_tags(p)
        assert "RescaleSlope" in meta            # dataset.py:545 containment
        assert meta["RescaleSlope"] == 2.0
        assert meta["RescaleIntercept"] == -1024.0
        assert meta["PhotometricInterpretation"] == "MONOCHROME1"
        assert meta["BitsStored"] == 16
        assert meta["Modality"] == "CT"


def test_nrrd_roundtrip(tmp_path):
    from llmmil_tpu.data import read_nrrd, write_nrrd
    rs = np.random.RandomState(0)
    for enc in ("gzip", "raw"):
        for dt in (np.int16, np.uint8, np.float32):
            arr = (rs.rand(7, 9, 5) * 100).astype(dt)
            p = str(tmp_path / f"m_{enc}_{np.dtype(dt).name}.nrrd")
            write_nrrd(p, arr, encoding=enc)
            back, hdr = read_nrrd(p)
            assert hdr["encoding"] == enc
            np.testing.assert_array_equal(back, arr)


def test_hospital_layout_no_sidecar(tmp_path):
    """A cohort laid out the way the reference reads it — per-study DICOM
    header (dataset.py:258-260) and nrrd tumour masks (dataset.py:265-270),
    NO json sidecar — round-trips through _load_ct/_load_tumor_mask."""
    from llmmil_tpu.data import write_dicom_ct_header, write_nrrd
    from llmmil_tpu.data.pipeline import reference_dicom_path

    root = str(tmp_path)
    _materialize(root)
    cfg = Config(modality=["CT"], model_CT="resnetMC3_18_wMask",
                 model_CI="simpleFCs_v1", CI_input_version="v1",
                 spacing=[2.0, 2.0, 2.5], ct_shape=[12, 40, 40],
                 ct_hw_override=40, augmentation=0,
                 hospital_test=["EUMC", "HUMC", "SCHMC"],
                 path_data_CT=os.path.join(root, "CT"),
                 path_data_pathology=os.path.join(root, "Pathology"),
                 path_data_excel=os.path.join(root, "Clinical_excel"),
                 path_data_mask=os.path.join(root, "TumorMask"),
                 learnablePrompt=0)
    ds = MultimodalDataset(cfg, "train")
    row = ds.df.iloc[0]

    # strip the JSON sidecars so only the DICOM path can supply metadata
    spacing = "X(2.0)Y(2.0)Z(2.5)"
    for hosp in HOSP:
        d = os.path.join(root, "CT", spacing, hosp)
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".json"):
                    os.remove(os.path.join(d, f))

    dcm = reference_dicom_path(cfg, row)
    assert dcm is not None and "LUNG_" in dcm
    os.makedirs(os.path.dirname(dcm), exist_ok=True)
    write_dicom_ct_header(dcm, rescale_slope=1.0, rescale_intercept=0.0,
                          photometric="MONOCHROME2", bits_stored=12)

    # nrrd mask in the reference layout: full-res + lowres, (X,Y,Z) order
    mask_xyz = np.zeros((40, 40, 12), np.uint8)      # sizes: X Y Z
    mask_xyz[10:20, 15:25, 3:7] = 1
    os.makedirs(os.path.join(root, "TumorMask", "prediction_3d_lowres"),
                exist_ok=True)
    write_nrrd(os.path.join(root, "TumorMask",
                            f"CT_{row['patientid']}.nrrd"), mask_xyz)
    write_nrrd(os.path.join(root, "TumorMask", "prediction_3d_lowres",
                            f"CT_{row['patientid']}.nrrd"), mask_xyz)

    img, mask = ds._load_ct(row, ds._sample_rng(0))
    assert img.shape == (12, 40, 40, 1)
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    assert mask is not None and mask.shape == (12, 40, 40, 1)
    # mask content survived the (X,Y,Z)→(Z,Y,X) transpose + F+L binarise
    assert mask.max() == 1.0
    np.testing.assert_array_equal(
        np.asarray(mask[..., 0] > 0).nonzero()[0].min(), 3)


def test_gzip_decompress_thread_safety():
    """Concurrent decodes (BatchLoader workers) must be exact — libdeflate
    decompressor handles are per-thread (a shared handle segfaults)."""
    import gzip
    from concurrent.futures import ThreadPoolExecutor

    from llmmil_tpu.data.ct_io import gzip_decompress

    payloads = [np.random.RandomState(i).bytes(2_000_000) for i in range(4)]
    gzs = [gzip.compress(p, 1) for p in payloads]
    with ThreadPoolExecutor(4) as pool:
        outs = list(pool.map(gzip_decompress, gzs * 6))
    for got, want in zip(outs, payloads * 6):
        assert bytes(got) == want


def test_gzip_decompress_multi_member(tmp_path):
    """Multi-member gzip is legal (RFC 1952: bgzip output, chunk-wise
    recompression) — all members must be decoded, not just the first
    (zlib.decompress(wbits=31) silently stops after member one)."""
    import gzip

    from llmmil_tpu.data.ct_io import gzip_decompress, read_nifti, \
        write_nifti

    a = np.random.RandomState(0).bytes(100_000)
    b = np.random.RandomState(1).bytes(50_000)
    two = gzip.compress(a) + gzip.compress(b)
    assert bytes(gzip_decompress(two)) == a + b
    # trailing zero padding after the last member (bgzip EOF convention)
    assert bytes(gzip_decompress(two + b"\x00" * 16)) == a + b

    # a .nii.gz whose payload is split across two members end-to-end
    vol = (np.random.RandomState(2).rand(6, 8, 10) * 50).astype(np.float32)
    plain = str(tmp_path / "v.nii")
    write_nifti(plain, vol)
    raw = open(plain, "rb").read()
    cut = len(raw) // 2
    with open(str(tmp_path / "v.nii.gz"), "wb") as f:
        f.write(gzip.compress(raw[:cut]) + gzip.compress(raw[cut:]))
    np.testing.assert_allclose(read_nifti(str(tmp_path / "v.nii.gz")),
                               vol, atol=1e-6)
