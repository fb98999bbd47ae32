"""Data-pipeline tests: cohort labeling, clinical encoding, tokenizer,
bags, CT I/O, synthetic end-to-end loader."""

import numpy as np
import pandas as pd
import pytest

from llmmil_tpu.config import Config
from llmmil_tpu.data import (
    select_with_label, select_valid_fields, hospital_split, kfold_split,
    stage_filter, clinical_vector, clinical_prompts, ClipTokenizer,
    tokenize, instance_dropout, pad_bag, bucket_for, read_nifti,
    crop_or_pad_volume, hu_normalize, SyntheticCohort, BatchLoader,
)
from llmmil_tpu.data.ct_io import write_nifti


def _cohort_df():
    return pd.DataFrame({
        "patientid": [f"P{i}" for i in range(6)],
        "hospital": ["AJMC", "EUMC", "CNUH", "HUMC", "PNUH", "SCHMC"],
        "treatedate": ["2010-01-01"] * 6,
        "lastdate": ["2016-01-01", "2012-01-01", "2012-01-01",
                     "2012-01-01", "2009-06-01", "2016-01-01"],
        "dead": [0, 1, 1, 1, 1, 1],
        "deathsign": [0, 1, 2, 0, 1, 1],
        "relapse": [0, 0, 0, 0, 0, 0],
    })


def test_survival_labeling_os():
    """survived ≥5y → 0; died deathsign1 → 1; deathsign2 → excluded;
    EUMC death → 1 regardless of deathsign (dataset.py:588-596)."""
    df = select_with_label(_cohort_df(), "OS", 5)
    got = dict(zip(df["patientid"], df["label"]))
    # P5 died *after* 5y (dead=1, duration≥5y) — the reference's negative
    # rule requires dead==0, so P5 is excluded, not labeled 0
    assert got == {"P0": 0, "P1": 1, "P4": 1}
    # P2 (deathsign 2) and P3 (dead w/o deathsign) are excluded
    # EUMC override: P1 with deathsign 1 at EUMC stays 1
    df2 = _cohort_df()
    df2.loc[1, "deathsign"] = 2          # EUMC death, deathsign 2
    got2 = dict(zip(*(lambda d: (d["patientid"], d["label"]))(
        select_with_label(df2, "OS", 5))))
    assert got2["P1"] == 1               # EUMC special case wins


def test_hospital_split_and_folds():
    df = pd.DataFrame({"patientid": [f"P{i}" for i in range(20)],
                       "hospital": (["AJMC", "CNUH", "PNUH", "EUMC"] * 5)})
    tr = hospital_split(df, ["EUMC", "HUMC", "SCHMC"], "train")
    te = hospital_split(df, ["EUMC", "HUMC", "SCHMC"], "test")
    assert set(tr["hospital"]) == {"AJMC", "CNUH", "PNUH"}
    assert set(te["hospital"]) == {"EUMC"}

    trn = kfold_split(tr, 4, 0, "train")
    val = kfold_split(tr, 4, 0, "valid")
    assert len(trn) + len(val) == len(tr)
    assert set(trn["patientid"]).isdisjoint(set(val["patientid"]))
    # same split is deterministic (random_state=42)
    val2 = kfold_split(tr, 4, 0, "valid")
    assert list(val["patientid"]) == list(val2["patientid"])


def test_stage_filter():
    df = pd.DataFrame({"cancerimaging": [1, "2a", 3, "4b"]})
    assert len(stage_filter(df, "12")) == 2
    assert len(stage_filter(df, "34")) == 2
    assert len(stage_filter(df, "1234")) == 4


ROW = {"sex": "M", "sm": "Y", "age": 63, "locationcancer": 1,
       "cancerimaging": "3a", "cancerimagingT": 1, "cancerimagingN": 2,
       "cancerimagingM": 0, "classification cancer": 1}


def test_clinical_vector_v1():
    v = clinical_vector(ROW, "v1")
    want = [0, (63 - 30) / 90, 1, 1 / 5, 3 / 4, 1 / 4, 2 / 4, 0, 1 / 2]
    np.testing.assert_allclose(v, want, atol=1e-6)
    vd = clinical_vector(ROW, "v1", duplicated=True)
    assert vd.shape[0] == 9 * 57     # 9 * (1 + floor(512/9))
    np.testing.assert_allclose(vd[:9], v)


def test_clinical_vector_v2_onehot():
    v = clinical_vector(ROW, "v2")
    assert v.shape[0] == 2 + 1 + 2 + 5 + 4 + 4 + 5 + 2 + 2  # 27
    assert v[0] == 1 and v[1] == 0          # sex M → eye(2)[0]
    vd = clinical_vector(ROW, "v2", duplicated=True)
    assert vd.shape[0] == 27 * 19


def test_clinical_prompts():
    p = clinical_prompts(ROW, "single", learnable_prompt=False)
    assert p == ["63 years old male smoker lung cancer patient stage 3 "
                 "T1N2M0 location right superior lobe type "
                 "adenocarcinoma."]
    p2 = clinical_prompts(ROW, "single", learnable_prompt=True, n_ctx=4)
    assert p2[0].startswith("X X X X 63 years old")
    pd_ = clinical_prompts(ROW, "devided", learnable_prompt=False)
    assert len(pd_) == 10 and pd_[0] == "a photo of lung cancer patient."


def test_tokenizer_roundtrip_and_shape():
    tok = ClipTokenizer()           # byte-level fallback
    ids = tok.encode("a lung cancer patient")
    assert all(i < 512 for i in ids)
    assert tok.decode(ids).strip() == "a lung cancer patient"

    arr = tokenize(["hello world", "x"], context_length=77, tokenizer=tok)
    assert arr.shape == (2, 77) and arr.dtype == np.int32
    assert arr[0, 0] == tok.sot
    # EOT is the max id in each row → argmax pooling invariant holds
    assert arr[0].max() == tok.eot
    with pytest.raises(RuntimeError):
        tokenize(["word " * 100], context_length=16, tokenizer=tok)


def test_tokenizer_with_merge_vocab(tmp_path):
    """Merge-rank BPE path with a synthetic vocab gz (the real CLIP vocab is
    an external asset; this exercises the same merge loop)."""
    import gzip
    p = str(tmp_path / "bpe.txt.gz")
    with gzip.open(p, "wt") as f:
        f.write("#version\nt h\nth e</w>\nc a\nca t</w>\n")
    tok = ClipTokenizer(bpe_path=p)
    # 'the' fully merges: t+h -> th, th+e</w> -> the</w>
    ids = tok.encode("the")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "the</w>"
    # 'cat' merges to ca + t</w> (no 'cat</w>' merge rule fires because the
    # 'ca'+'t</w>' pair needs 'ca t</w>' — present → single token)
    ids2 = tok.encode("cat")
    assert tok.decode(ids2).strip() == "cat"
    # unmergeable word falls back to byte tokens + </w>
    ids3 = tok.encode("xy")
    assert len(ids3) == 2
    assert tok.decode(ids3).strip() == "xy"


def test_bag_ops():
    rs = np.random.RandomState(0)
    feat = rs.randn(100, 8).astype(np.float32)
    kept = instance_dropout(feat, "Biopsy", rs)
    assert kept.shape[0] == 90
    kept_r = instance_dropout(feat, "Resection", rs)
    assert kept_r.shape[0] == 80

    assert bucket_for(100, (128, 512)) == 128
    assert bucket_for(600, (128, 512)) == 512   # caps at last bucket

    padded, mask = pad_bag(feat, 128)
    assert padded.shape == (128, 8) and mask.sum() == 100
    np.testing.assert_array_equal(padded[:100], feat)


def test_nifti_roundtrip(tmp_path):
    vol = (np.random.RandomState(0).rand(10, 12, 14) * 100).astype(
        np.float32)
    p = str(tmp_path / "x.nii.gz")
    write_nifti(p, vol)
    back = read_nifti(p)
    np.testing.assert_allclose(back, vol, atol=1e-6)


def test_hu_normalize():
    img = np.array([[-3000.0, 0.0, 5000.0]])
    out = hu_normalize(img, {})
    np.testing.assert_allclose(out[0], [(-1024 + 1024) / 2024,
                                        1024 / 2024, 2024 / 2024])
    out2 = hu_normalize(np.array([[100.0]]),
                        {"RescaleSlope": 2, "RescaleIntercept": -1000})
    np.testing.assert_allclose(out2[0, 0], (-800 + 1024) / 2024)


def test_tumor_crop_box():
    """Faithful to the reference's formula (dataset.py:346-348), which uses
    (max−min)/2 — the half-RANGE, not the centroid (a reference quirk):
    a mask spanning [10,20) gives 'center' (19−10)//2 = 4 per axis."""
    from llmmil_tpu.data.ct_io import tumor_crop_box
    img = np.ones((40, 40, 40), np.float32)
    mask = np.zeros_like(img)
    mask[10:20, 12:22, 14:24] = 1
    out = tumor_crop_box(img, mask, half=5)
    # box = [max(0,4-5) : 4+5] = [0:9) per axis → 9³ ones
    assert out.sum() == 9 ** 3
    assert out[0, 0, 0] == 1 and out[20, 20, 20] == 0
    # empty mask → box around the volume centre (dataset.py:344-346)
    out2 = tumor_crop_box(img, np.zeros_like(img), half=5)
    assert out2.sum() == 10 ** 3
    assert out2[20, 20, 20] == 1


def test_crop_or_pad():
    img = np.zeros((100, 300, 300), np.float32)
    out = crop_or_pad_volume(img, 160, 224)
    assert out.shape == (160, 224, 224)
    img2 = np.zeros((200, 100, 100), np.float32)
    out2 = crop_or_pad_volume(img2, 160, 224)
    assert out2.shape == (160, 224, 224)


def test_synthetic_end_to_end_loader():
    cfg = Config(modality=["pathology"], model_CI="simpleFCs_v1",
                 CI_input_version="v1", batch_size=4, augmentation=1,
                 bag_buckets=[128, 256, 512], learnablePrompt=0)
    syn = SyntheticCohort(cfg, n_per_hospital=6, seed=1)
    ds = syn.dataset(cfg, "train")
    assert len(ds) > 0
    loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["input_pathology"].shape[0] == 4
    assert b["input_pathology"].shape[1] in (128, 256, 512)
    assert b["mask_pathology"].shape == b["input_pathology"].shape[:2]
    assert b["label"].shape == (4, 2)
    assert b["input_CI"].shape == (4, 9)

    # epoch reshuffle changes batch composition deterministically
    loader.set_epoch(1)
    b1 = next(iter(loader))
    loader.set_epoch(1)
    b1_again = next(iter(loader))
    assert b1["ID"] == b1_again["ID"]


def test_synthetic_text_ci_tokens():
    cfg = Config(modality=["pathology"], model_CI="CLIP",
                 CI_input_version="text", CI_prompt_version="devided",
                 batch_size=2, learnablePrompt=1, n_ctx=4)
    syn = SyntheticCohort(cfg, n_per_hospital=4, seed=2)
    ds = syn.dataset(cfg, "valid")
    s = ds[0]
    assert s["input_CI"].shape == (10, 77)     # 10 devided prompts
    assert s["input_CI"].dtype == np.int32

    # 'single' prompt (~114 byte-tokens) must truncate, not crash, under
    # the byte-level fallback tokenizer
    cfg2 = cfg.replace(CI_prompt_version="single")
    ds2 = syn.dataset(cfg2, "valid")
    s2 = ds2[0]
    assert s2["input_CI"].shape == (1, 77)
    assert s2["input_CI"][0].max() == 49407    # EOT survives truncation
