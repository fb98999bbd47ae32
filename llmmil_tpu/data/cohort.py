"""Cohort construction: master-table filtering, survival labels, splits.

Parity targets: ``dataset.py:35-136`` (row filtering, hospital-based
train/test split, KFold train/valid, excluded patient IDs, cancer-stage
subsetting) and ``dataset.py:582-610`` (OS/RFS survival labeling with the
EUMC special case).  All pure pandas — runs on the host, feeds the device
pipeline.

The master table is ``Lung_Overall2.xlsx`` in the reference; a same-schema
``.csv`` is accepted first-class (this environment has no excel reader).
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np
import pandas as pd

ALL_HOSPITALS = ["AJMC", "EUMC", "CNUH", "HUMC", "PNUH", "SCHMC"]

# dataset.py:90-112 — CT rotated / too few z-slices / over-cropped
EXCLUDED_PATIENT_IDS = [
    "A10065", "A10094",
    "A11512", "A12867",
    "A10237", "A110004", "A110027", "A110541",
    "A40186", "A40211", "A40222", "A40235", "A40251", "A40261", "A40273",
    "A40274", "A40280", "A40281", "A40282", "A40301", "A40308", "A40322",
    "A40326", "A40343", "A40348", "A40359", "A40368", "A40374", "A40375",
    "A40379", "A40393", "A40430", "A40453", "A40461", "A40472", "A40478",
    "A40490", "A40494", "A40495", "A40505", "A40541", "A40629", "A40637",
    "A40856", "A40860", "A40865", "A40884", "A40914", "A40932", "A40941",
    "A40947", "A40949", "A40958", "A40966", "A40968", "A40988", "A40991",
    "A40992", "A40993", "A41011", "A41056", "A41060", "A41508", "A41510",
    "A41513", "A41521", "A41547", "A41548", "A41557", "A41592", "A41599",
    "A41601", "A41614", "A41619", "A41622", "A41637", "A41653", "A41690",
    "A41704", "A41710", "A41712",
    "A60253", "A60374",
    "A93650", "A96982",
    "A131302", "A131341",
    "A70312",
    "A90169", "A91031", "A93350", "A93761", "A96937",
]

_STAGE_SETS = {
    "1": [1, "1", "1a", "1b", "1c"],
    "2": [2, "2", "2a", "2b", "2c"],
    "3": [3, "3", "3a", "3b", "3c"],
    "4": [4, "4", "4a", "4b", "4c"],
}


def load_cohort_table(path_data_excel: str) -> pd.DataFrame:
    """Load the master sheet (xlsx if a reader exists, else csv)."""
    for name, reader in (("Lung_Overall2.xlsx", pd.read_excel),
                         ("Lung_Overall2.csv", pd.read_csv)):
        p = os.path.join(path_data_excel, name)
        if os.path.exists(p):
            try:
                return reader(p)
            except ImportError:
                continue
    raise FileNotFoundError(
        f"no Lung_Overall2.(xlsx|csv) under {path_data_excel}")


def select_with_label(df: pd.DataFrame, survival_type: str = "OS",
                      year: int = 5) -> pd.DataFrame:
    """Survival labeling (dataset.py:582-610): label 0 = survived ≥ year·365
    days, 1 = died of disease (deathsign 1, or any death at EUMC),
    2 = excluded (deathsign 2), 3 = undetermined; keep {0, 1}."""
    df = df.copy()
    df["label"] = 3
    duration = (pd.to_datetime(df["lastdate"])
                - pd.to_datetime(df["treatedate"])).abs().dt.days
    if survival_type == "OS":
        df.loc[(duration >= year * 365) & (df["dead"] == 0), "label"] = 0
        died = (duration < year * 365) & (duration > 0) & (df["dead"] == 1)
        df.loc[died & (df["deathsign"] == 1), "label"] = 1
        df.loc[died & (df["deathsign"] == 2), "label"] = 2
        df.loc[died & (df["hospital"] == "EUMC"), "label"] = 1
    elif survival_type == "RFS":
        df.loc[(duration >= year * 365) & (df["relapse"] == 1), "label"] = 0
        df.loc[(duration < year * 365) & (duration > 0)
               & (df["relapse"] != 1), "label"] = 1
    return df.loc[df["label"].isin([0, 1])]


def select_valid_fields(df: pd.DataFrame) -> pd.DataFrame:
    """Clinical-field validity filter + derived labels
    (dataset.py:612-631)."""
    stages = [1, 2, 3, 4, "1", "2", "3", "4",
              "1a", "1b", "1c", "2a", "2b", "2c",
              "3a", "3b", "3c", "4a", "4b", "4c"]
    df = df[df["classification cancer"].isin([1, 2])]
    df = df[df["cancerimaging"].isin(stages)]
    df = df[df["cancerimagingT"].isin(stages)]
    df = df[df["cancerimagingN"].isin([0, "0"] + stages)]
    df = df[df["cancerimagingM"].isin([0, 1, "0", "1", "1a", "1b", "1c"])]
    df = df.loc[df["sex"].isin(["M", "F"])]
    df = df.loc[df["sm"].isin(["N", "Y"])]
    df = df.loc[df["locationcancer"].isin([1, 2, 3, 4, 5])].copy()
    high_t = [3, "3", "3a", "3b", "3c", 4, "4", "4a", "4b", "4c"]
    df["label_T"] = 0
    df.loc[df["cancerimagingT"].isin(high_t), "label_T"] = 1
    df["label_TNM"] = 0
    df.loc[df["cancerimaging"].isin(high_t), "label_TNM"] = 1
    return df


def hospital_split(df: pd.DataFrame, hospital_test: Sequence[str],
                   mode: str) -> pd.DataFrame:
    """Train hospitals = ALL − hospital_test (dataset.py:67-78)."""
    if mode == "test":
        hospitals = list(hospital_test)
    else:
        hospitals = [h for h in ALL_HOSPITALS if h not in hospital_test]
    return df.loc[df["hospital"].isin(hospitals)]


def kfold_split(df: pd.DataFrame, kfold_num: int, val_fold: int,
                mode: str) -> pd.DataFrame:
    """sklearn KFold(shuffle=True, random_state=42) train/valid
    (dataset.py:80-88)."""
    if mode == "test":
        return df
    from sklearn.model_selection import KFold
    kf = KFold(n_splits=kfold_num, shuffle=True, random_state=42)
    for i, (tr, va) in enumerate(kf.split(df)):
        if i == val_fold:
            return df.iloc[va] if mode == "valid" else df.iloc[tr]
    raise ValueError(f"val_fold {val_fold} out of range")


def stage_filter(df: pd.DataFrame, cancerstage: str) -> pd.DataFrame:
    """Cancer-stage subsetting (dataset.py:115-134)."""
    if cancerstage in ("", "1234", None):
        return df
    allowed: List = []
    for ch in cancerstage:
        allowed += _STAGE_SETS[ch]
    return df[df["cancerimaging"].isin(allowed)]


def build_cohort(cfg, mode: str) -> pd.DataFrame:
    """Full cohort pipeline for a split (dataset.py:52-134)."""
    df = load_cohort_table(cfg.path_data_excel)
    df = df.loc[~df["CT_before1"].isna()]
    if "CT ID mismatch" in df:
        df = df.loc[df["CT ID mismatch"].isin([0])]
    df = df.loc[df["pathologyimage"].isin(["Biopsy", "Resection"])]
    df = select_with_label(df, cfg.survival_type, cfg.year)
    df = select_valid_fields(df)
    df = hospital_split(df, cfg.hospital_test, mode)
    df = kfold_split(df, cfg.kfold_num, cfg.val_fold, mode)
    df = df[~df["patientid"].isin(EXCLUDED_PATIENT_IDS)]
    stage = cfg.cancerstageTrain if mode == "train" else cfg.cancerstageTest
    return stage_filter(df, stage)
