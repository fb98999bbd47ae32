"""Adversarial-input robustness for the binary medical-IO parsers.

The reference delegates to pydicom/pynrrd; this framework parses DICOM and
NRRD itself (data/medical_io.py), so hostile bytes are OUR responsibility:
a truncated or bit-flipped hospital export must surface as a clean
per-file ``ValueError`` (or a partial-but-typed dict for DICOM, whose
format is a self-delimiting tag stream) — never a bare ``struct.error``,
``KeyError``, hang, or silently wrong array.
"""

import gzip
import os

import numpy as np
import pytest

from llmmil_tpu.data.medical_io import (read_dicom_tags, read_nrrd,
                                        write_dicom_ct_header, write_nrrd)


def _dicom_bytes(tmp_path, implicit):
    p = str(tmp_path / f"ct_{implicit}.dcm")
    write_dicom_ct_header(p, rescale_slope=1.0, rescale_intercept=-1024.0,
                          implicit=implicit)
    with open(p, "rb") as f:
        return p, f.read()


@pytest.mark.parametrize("implicit", [False, True])
def test_dicom_every_truncation_is_clean(tmp_path, implicit):
    p, blob = _dicom_bytes(tmp_path, implicit)
    full = read_dicom_tags(p)
    assert full["RescaleIntercept"] == -1024.0
    q = str(tmp_path / "trunc.dcm")
    for n in range(len(blob)):
        with open(q, "wb") as f:
            f.write(blob[:n])
        try:
            out = read_dicom_tags(q)
        except ValueError:
            continue                    # clean, path-attributed error
        assert isinstance(out, dict)    # partial parse is fine
        for k, v in out.items():
            assert k in full


@pytest.mark.parametrize("implicit", [False, True])
def test_dicom_bitflip_fuzz_never_crashes_raw(tmp_path, implicit):
    p, blob = _dicom_bytes(tmp_path, implicit)
    q = str(tmp_path / "flip.dcm")
    rs = np.random.RandomState(0)
    for _ in range(200):
        b = bytearray(blob)
        for _ in range(rs.randint(1, 4)):
            b[rs.randint(len(b))] ^= 1 << rs.randint(8)
        with open(q, "wb") as f:
            f.write(bytes(b))
        try:
            out = read_dicom_tags(q)
            assert isinstance(out, dict)
        except ValueError:
            pass


def test_dicom_random_garbage(tmp_path):
    q = str(tmp_path / "garbage.bin")
    rs = np.random.RandomState(1)
    for n in (0, 1, 7, 131, 132, 500):
        with open(q, "wb") as f:
            f.write(rs.bytes(n))
        try:
            out = read_dicom_tags(q)
            assert isinstance(out, dict)
        except ValueError:
            pass


@pytest.mark.parametrize("encoding", ["gzip", "raw"])
def test_nrrd_every_truncation_raises_valueerror(tmp_path, encoding):
    p = str(tmp_path / "m.nrrd")
    arr = (np.arange(60).reshape(3, 4, 5) % 2).astype(np.uint8)
    write_nrrd(p, arr, encoding=encoding)
    with open(p, "rb") as f:
        blob = f.read()
    back, _ = read_nrrd(p)
    np.testing.assert_array_equal(back, arr)

    q = str(tmp_path / "trunc.nrrd")
    for n in range(len(blob)):
        with open(q, "wb") as f:
            f.write(blob[:n])
        with pytest.raises(ValueError):
            read_nrrd(q)


def test_nrrd_header_corruptions(tmp_path):
    p = str(tmp_path / "m.nrrd")
    arr = np.ones((2, 3, 4), np.uint8)
    write_nrrd(p, arr, encoding="raw")
    with open(p, "rb") as f:
        text = f.read()

    def variant(repl):
        q = str(tmp_path / "bad.nrrd")
        with open(q, "wb") as f:
            f.write(repl)
        return q

    # missing sizes line
    lines = text.split(b"\n")
    no_sizes = b"\n".join(ln for ln in lines if not ln.startswith(b"sizes"))
    with pytest.raises(ValueError, match="sizes"):
        read_nrrd(variant(no_sizes))
    # unknown dtype
    with pytest.raises(ValueError, match="type"):
        read_nrrd(variant(text.replace(b"type: ", b"type: quux")))
    # unknown encoding
    with pytest.raises(ValueError, match="encoding"):
        read_nrrd(variant(text.replace(b"encoding: raw",
                                       b"encoding: bzip2")))
    # sizes disagree with payload
    with pytest.raises(ValueError):
        read_nrrd(variant(text.replace(b"sizes: 2 3 4", b"sizes: 9 9 9")))
    # not an NRRD at all
    with pytest.raises(ValueError, match="NRRD"):
        read_nrrd(variant(b"PNG\r\n" + text[8:]))


def test_nrrd_gzip_corrupt_payload(tmp_path):
    p = str(tmp_path / "m.nrrd")
    arr = np.zeros((4, 4, 4), np.uint8)
    write_nrrd(p, arr, encoding="gzip")
    with open(p, "rb") as f:
        blob = f.read()
    sep = blob.index(b"\n\n") + 2
    bad = blob[:sep] + bytes(reversed(blob[sep:]))
    q = str(tmp_path / "bad.nrrd")
    with open(q, "wb") as f:
        f.write(bad)
    with pytest.raises(ValueError):
        read_nrrd(q)
