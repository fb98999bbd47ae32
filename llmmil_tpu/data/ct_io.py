"""CT volume I/O and preprocessing (host-side numpy).

Parity targets: ``dataset.py:252-363`` (NIfTI load via SimpleITK, crop/pad to
(160, H_, W_), tumor-crop box) and ``dataset.py:544-580``
(``preprocessing_with_metadata``: rescale slope/intercept, HU clamp
[−1024, 1000], MONOCHROME1 inversion, normalise to [0,1)).

SimpleITK/pydicom are absent here, so: a minimal pure-numpy NIfTI-1 reader
(.nii / .nii.gz) replaces ``sitk.ReadImage`` and DICOM metadata is accepted
as a plain dict (e.g. exported to JSON next to the volume).
"""

from __future__ import annotations

import gzip
import json
import os
import struct
from typing import Dict, Tuple

import numpy as np

_NIFTI_DTYPES = {2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
                 64: np.float64, 256: np.int8, 512: np.uint16,
                 768: np.uint32}

_LIBDEFLATE: list = []          # [lib] once loaded; [] = unprobed;
                                # [None] = unavailable
_LIBDEFLATE_TLS = None          # thread-local decompressor handles:
                                # libdeflate decompressors are NOT
                                # thread-safe, and BatchLoader workers
                                # decode concurrently


def _libdeflate_handle(lib):
    global _LIBDEFLATE_TLS
    import threading

    if _LIBDEFLATE_TLS is None:
        _LIBDEFLATE_TLS = threading.local()
    dec = getattr(_LIBDEFLATE_TLS, "dec", None)
    if dec is None:
        dec = lib.libdeflate_alloc_decompressor()
        _LIBDEFLATE_TLS.dec = dec
    return dec


def gzip_decompress(data: bytes) -> bytes:
    """Whole-buffer gzip decompression via libdeflate when the system
    library exists — measured 2.1× zlib on this host (539 vs 1115 ms for a
    113 MB CT volume, the input pipeline's single largest stage,
    BENCH_NOTES r3) — with a zlib fallback.  Exact output either way;
    returns a bytes-like buffer (numpy uint8 on the libdeflate path,
    zero-copy into ``np.frombuffer``)."""
    if not _LIBDEFLATE:
        try:
            import ctypes
            lib = ctypes.CDLL("libdeflate.so.0")
            lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
            # the _ex variant also reports bytes CONSUMED — the only way
            # to tell a fully-decoded single-member stream from a
            # multi-member one whose first member happens to match the
            # trailer ISIZE (which is the LAST member's size, RFC 1952)
            lib.libdeflate_gzip_decompress_ex.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_size_t)]
            _LIBDEFLATE.append(lib)
        except Exception:                                # pragma: no cover
            _LIBDEFLATE.append(None)
    if _LIBDEFLATE[0] is not None and len(data) >= 18:
        import ctypes
        lib = _LIBDEFLATE[0]
        dec = _libdeflate_handle(lib)
        # gzip trailer ISIZE = decompressed size mod 2^32; good for <4 GiB
        # volumes — on any mismatch (multi-member, giant file) fall back
        isize = int.from_bytes(data[-4:], "little")
        if 0 < isize < 2 ** 32 - 1:
            # decompress straight into a numpy buffer: .raw on a ctypes
            # buffer would memcpy the whole volume (~100 ms at 113 MB)
            out = np.empty(isize, np.uint8)
            n_in = ctypes.c_size_t(0)
            n_out = ctypes.c_size_t(0)
            rc = lib.libdeflate_gzip_decompress_ex(
                dec, data, len(data),
                out.ctypes.data_as(ctypes.c_void_p), isize,
                ctypes.byref(n_in), ctypes.byref(n_out))
            # n_in < len(data): more members (or trailing pad) follow —
            # only trust the fast path when it consumed everything but
            # zero padding (bgzip's EOF convention)
            leftover = data[n_in.value:]
            if (rc == 0 and n_out.value == isize
                    and (not leftover or not any(leftover))):
                return out
    import zlib

    # Multi-member streams are legal gzip (RFC 1952 §2.2: bgzip output,
    # chunk-wise recompression); zlib.decompress(wbits=31) would silently
    # return only the FIRST member, so walk the members explicitly.
    out = []
    buf = data
    while buf:
        if len(buf) < 18 or bytes(buf[:2]) != b"\x1f\x8b":
            break                   # trailing pad/garbage after last member
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf))
        out.append(d.flush())
        buf = d.unused_data
    if not out:
        raise ValueError("not a gzip stream")
    return out[0] if len(out) == 2 and not out[1] else b"".join(out)


def read_nifti(path: str) -> np.ndarray:
    """Minimal NIfTI-1 reader returning the raw voxel array in (Z, Y, X)
    order (matching ``sitk.GetArrayFromImage``'s axis convention)."""
    with open(path, "rb") as f:
        buf = f.read()
    if path.endswith(".gz"):
        buf = gzip_decompress(buf)
    return _parse_nifti(buf, path)


def _parse_nifti(buf: bytes, path: str) -> np.ndarray:
    """Parse a decompressed in-memory NIfTI-1 byte buffer (no extra copy:
    the (X,Y,Z) Fortran array transposed to (Z,Y,X) is already C-ordered,
    so ``ascontiguousarray`` is a view)."""
    hdr = buf[:348]
    if struct.unpack("<i", hdr[:4])[0] != 348:
        raise ValueError(f"{path}: not a NIfTI-1 file")
    dim = struct.unpack("<8h", hdr[40:56])
    datatype = struct.unpack("<h", hdr[70:72])[0]
    vox_offset = int(struct.unpack("<f", hdr[108:112])[0])
    scl_slope = struct.unpack("<f", hdr[112:116])[0]
    scl_inter = struct.unpack("<f", hdr[116:120])[0]
    shape = tuple(dim[1:1 + dim[0]])
    dtype = _NIFTI_DTYPES.get(datatype)
    if dtype is None:
        raise ValueError(f"{path}: unsupported NIfTI dtype {datatype}")
    count = int(np.prod(shape))
    data = np.frombuffer(buf, dtype=dtype, count=count,
                         offset=max(vox_offset, 348))
    arr = data.reshape(shape, order="F")
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        arr = arr * (scl_slope or 1.0) + scl_inter
    return np.ascontiguousarray(np.transpose(arr.squeeze()))


def write_nifti(path: str, arr: np.ndarray) -> None:
    """Minimal NIfTI-1 writer (tests / synthetic data); arr is (Z, Y, X)."""
    arr = np.asarray(arr)
    data = np.transpose(arr)                    # back to (X, Y, Z)
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    code = {np.dtype(np.int16): 4, np.dtype(np.float32): 16,
            np.dtype(np.float64): 64, np.dtype(np.uint8): 2,
            np.dtype(np.int32): 8}[data.dtype]
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)
    struct.pack_into("<f", hdr, 108, 352.0)     # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)       # scl_slope
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + data.tobytes(order="F")
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(payload)


def load_ct_metadata(path: str) -> Dict:
    """DICOM metadata substitute: a JSON dict with RescaleSlope,
    RescaleIntercept, PhotometricInterpretation, BitsStored."""
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def hu_normalize(img: np.ndarray, metadata: Dict | None = None
                 ) -> np.ndarray:
    """``preprocessing_with_metadata`` (dataset.py:544-580): slope/intercept
    rescale, clamp to [−1024, 1000], MONOCHROME1 inversion, map to [0,1)."""
    metadata = metadata or {}
    img = np.asarray(img, dtype=np.float32)
    if "RescaleSlope" in metadata and "RescaleIntercept" in metadata:
        img = img * float(metadata["RescaleSlope"]) \
            + float(metadata["RescaleIntercept"])
    img = np.clip(img, -1024, 1000)
    if metadata.get("PhotometricInterpretation") == "MONOCHROME1":
        img = 2 ** int(metadata.get("BitsStored", 12)) - img
    return (img + 1024) / (1000 + 1024)


def crop_or_pad_volume(img: np.ndarray, depth: int = 160,
                       hw: int = 512) -> np.ndarray:
    """Fix (C, H, W) to (depth, hw, hw): slice-from-front / centre-pad depth,
    centre-crop/pad in-plane (dataset.py:301-339)."""
    c, h, w = img.shape
    if c >= depth:
        img = img[:depth]
    else:
        d = depth - c
        img = np.pad(img, ((d // 2, d - d // 2), (0, 0), (0, 0)))
    h = img.shape[1]
    if h >= hw:
        d = h - hw
        img = img[:, d // 2:d // 2 + hw, d // 2:d // 2 + hw]
    else:
        d = hw - h
        img = np.pad(img, ((0, 0), (d // 2, d - d // 2),
                           (d // 2, d - d // 2)))
    return img


def tumor_crop_box(img: np.ndarray, mask: np.ndarray,
                   half: int = 50) -> np.ndarray:
    """Zero outside a (2·half)³ box around the mask centre
    (dataset.py:341-363)."""
    box = np.zeros_like(mask)
    coords = np.where(mask == 1)
    if len(coords[0]) == 0:
        center = [s // 2 for s in mask.shape]
    else:
        center = [int((c.max() - c.min()) / 2) for c in coords]
    sl = tuple(slice(max(0, ctr - half), min(s, ctr + half))
               for ctr, s in zip(center, mask.shape))
    box[sl] = 1
    return img * box
