"""ctypes bindings for the native C++ data packer (graceful fallback).

``native/packer.cc`` provides fused single-pass versions of the input
pipeline's CPU hot ops (SURVEY §3.1); when the shared library is absent the
numpy implementations in ``ct_io``/``bags`` are used instead.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "libllmmil_packer.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, f32p = ctypes.c_int64, np.ctypeslib.ndpointer(np.float32)
    u8p = np.ctypeslib.ndpointer(np.uint8)
    i64p = np.ctypeslib.ndpointer(np.int64)
    lib.hu_normalize_crop.argtypes = [
        f32p, i64, i64, i64, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, i64, i64, f32p]
    lib.pack_bag.argtypes = [f32p, i64, i64, i64, f32p, u8p]
    lib.gather_rows.argtypes = [f32p, i64, i64, i64p, i64, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def hu_normalize_crop(img: np.ndarray, metadata: dict | None,
                      depth: int, hw: int) -> Optional[np.ndarray]:
    """Fused hu_normalize + crop_or_pad_volume; None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    metadata = metadata or {}
    img = np.ascontiguousarray(img, dtype=np.float32)
    out = np.empty((depth, hw, hw), dtype=np.float32)
    c, h, w = img.shape
    lib.hu_normalize_crop(
        img, c, h, w,
        float(metadata.get("RescaleSlope", 1.0)),
        float(metadata.get("RescaleIntercept", 0.0)),
        int(metadata.get("PhotometricInterpretation") == "MONOCHROME1"),
        int(metadata.get("BitsStored", 12)), depth, hw, out)
    return out


def pack_bag(feat: np.ndarray, target: int
             ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    feat = np.ascontiguousarray(feat, dtype=np.float32)
    n, d = feat.shape
    out = np.empty((target, d), dtype=np.float32)
    mask = np.empty(target, dtype=np.uint8)
    lib.pack_bag(feat, n, d, target, out, mask)
    return out, mask.astype(bool)


def gather_rows(feat: np.ndarray, idx: np.ndarray
                ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    feat = np.ascontiguousarray(feat, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    out = np.empty((len(idx), feat.shape[1]), dtype=np.float32)
    lib.gather_rows(feat, feat.shape[0], feat.shape[1], idx, len(idx), out)
    return out
