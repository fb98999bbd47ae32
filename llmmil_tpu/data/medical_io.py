"""Pure-python readers for the reference's on-disk hospital formats.

Parity targets:
- ``pydicom.read_file`` metadata ingestion (``/root/reference/dataset.py:
  258-260``): the only fields the pipeline consumes are the ones
  ``preprocessing_with_metadata`` reads (``dataset.py:544-580``) —
  RescaleSlope, RescaleIntercept, PhotometricInterpretation, BitsStored —
  plus the window/geometry tags kept for completeness.
- ``nrrd.read`` tumour masks (``dataset.py:265-299``): NRRD0004/5 headers
  with raw or gzip encodings, Fortran index order like pynrrd's default.

Neither pydicom nor pynrrd is installed here, so both formats are parsed
directly: DICOM part-10 explicit/implicit-VR little-endian headers (with
proper undefined-length sequence skipping), and the NRRD text header + gzip
payload.  Writers for both formats exist so tests can synthesize fixtures
that round-trip the exact path the hospital data would take.
"""

from __future__ import annotations

import gzip
import io
import os
import struct
import zlib
from typing import Any, BinaryIO, Dict, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# DICOM
# ---------------------------------------------------------------------------

# Tags the CT pipeline consumes (group, element) → keyword.
_DICOM_KEYWORDS = {
    (0x0008, 0x0060): "Modality",
    (0x0010, 0x0040): "PatientSex",
    (0x0018, 0x0050): "SliceThickness",
    (0x0028, 0x0002): "SamplesPerPixel",
    (0x0028, 0x0004): "PhotometricInterpretation",
    (0x0028, 0x0010): "Rows",
    (0x0028, 0x0011): "Columns",
    (0x0028, 0x0030): "PixelSpacing",
    (0x0028, 0x0100): "BitsAllocated",
    (0x0028, 0x0101): "BitsStored",
    (0x0028, 0x0102): "HighBit",
    (0x0028, 0x0103): "PixelRepresentation",
    (0x0028, 0x1050): "WindowCenter",
    (0x0028, 0x1051): "WindowWidth",
    (0x0028, 0x1052): "RescaleIntercept",
    (0x0028, 0x1053): "RescaleSlope",
    (0x0028, 0x1054): "RescaleType",
}
# VRs for those tags, for implicit-VR files.
_IMPLICIT_VRS = {
    (0x0008, 0x0060): "CS", (0x0010, 0x0040): "CS",
    (0x0018, 0x0050): "DS", (0x0028, 0x0002): "US",
    (0x0028, 0x0004): "CS", (0x0028, 0x0010): "US",
    (0x0028, 0x0011): "US", (0x0028, 0x0030): "DS",
    (0x0028, 0x0100): "US", (0x0028, 0x0101): "US",
    (0x0028, 0x0102): "US", (0x0028, 0x0103): "US",
    (0x0028, 0x1050): "DS", (0x0028, 0x1051): "DS",
    (0x0028, 0x1052): "DS", (0x0028, 0x1053): "DS",
    (0x0028, 0x1054): "LO",
}
# Explicit VRs that use a 2-byte reserved field + 4-byte length.
_LONG_VRS = {b"OB", b"OW", b"OF", b"OD", b"OL", b"SQ", b"UC", b"UR",
             b"UT", b"UN"}

_IMPLICIT_LE = "1.2.840.10008.1.2"
_EXPLICIT_LE = "1.2.840.10008.1.2.1"


def _decode_value(vr: str, raw: bytes) -> Any:
    """Decode a DICOM element value for the VRs the pipeline needs."""
    if vr in ("DS", "IS"):
        txt = raw.decode("ascii", "ignore").strip("\x00 ").strip()
        if not txt:
            return None
        conv = float if vr == "DS" else int
        parts = [conv(p) for p in txt.split("\\") if p.strip()]
        return parts[0] if len(parts) == 1 else parts
    if vr == "US":
        vals = struct.unpack(f"<{len(raw) // 2}H", raw)
        return vals[0] if len(vals) == 1 else list(vals)
    if vr == "UL":
        vals = struct.unpack(f"<{len(raw) // 4}I", raw)
        return vals[0] if len(vals) == 1 else list(vals)
    if vr == "SS":
        vals = struct.unpack(f"<{len(raw) // 2}h", raw)
        return vals[0] if len(vals) == 1 else list(vals)
    if vr == "FL":
        vals = struct.unpack(f"<{len(raw) // 4}f", raw)
        return vals[0] if len(vals) == 1 else list(vals)
    if vr == "FD":
        vals = struct.unpack(f"<{len(raw) // 8}d", raw)
        return vals[0] if len(vals) == 1 else list(vals)
    # CS, LO, SH, UI, PN, DA, TM, AS, ST, … — text
    return raw.decode("ascii", "ignore").strip("\x00 ").strip()


def _read_tag(f: BinaryIO) -> Tuple[int, int] | None:
    b = f.read(4)
    if len(b) < 4:
        return None
    return struct.unpack("<HH", b)


def _skip_undefined_sequence(f: BinaryIO, explicit: bool) -> None:
    """Skip an undefined-length SQ: items until the (FFFE,E0DD) delimiter.

    Item contents are themselves element streams, so undefined-length items
    recurse through the normal element walk."""
    while True:
        tag = _read_tag(f)
        if tag is None:
            return
        length = struct.unpack("<I", f.read(4))[0]
        if tag == (0xFFFE, 0xE0DD):                # sequence delimiter
            return
        if tag == (0xFFFE, 0xE000):                # item
            if length == 0xFFFFFFFF:
                _skip_undefined_item(f, explicit)
            else:
                f.seek(length, io.SEEK_CUR)
        else:                                      # malformed — bail out
            return


def _skip_undefined_item(f: BinaryIO, explicit: bool) -> None:
    """Skip elements inside an undefined-length item until (FFFE,E00D)."""
    while True:
        tag = _read_tag(f)
        if tag is None:
            return
        if tag == (0xFFFE, 0xE00D):                # item delimiter
            f.seek(4, io.SEEK_CUR)                 # zero length
            return
        f.seek(-4, io.SEEK_CUR)
        if _walk_element(f, explicit, None) is None:
            return


def _walk_element(f: BinaryIO, explicit: bool,
                  out: Dict[str, Any] | None) -> Tuple[int, int] | None:
    """Parse one element; record it in ``out`` if it's a tag we keep.
    Returns the tag, or None at EOF / pixel data."""
    tag = _read_tag(f)
    if tag is None:
        return None
    if explicit and tag[0] != 0xFFFE:
        vr = f.read(2)
        if vr in _LONG_VRS:
            f.seek(2, io.SEEK_CUR)
            length = struct.unpack("<I", f.read(4))[0]
        else:
            length = struct.unpack("<H", f.read(2))[0]
        vr_s = vr.decode("ascii", "ignore")
    else:
        length = struct.unpack("<I", f.read(4))[0]
        vr_s = _IMPLICIT_VRS.get(tag, "UN")

    if tag == (0x7FE0, 0x0010):                    # pixel data — stop
        return None
    if length == 0xFFFFFFFF:                       # undefined-length SQ/UN
        _skip_undefined_sequence(f, explicit)
        return tag
    if out is not None and tag in _DICOM_KEYWORDS:
        out[_DICOM_KEYWORDS[tag]] = _decode_value(vr_s, f.read(length))
    else:
        f.seek(length, io.SEEK_CUR)
    return tag


def read_dicom_tags(path: str) -> Dict[str, Any]:
    """Parse the header tags of a DICOM part-10 file into a plain dict.

    Supports explicit- and implicit-VR little endian (the transfer syntaxes
    hospital CT exports use); compressed-pixel syntaxes parse fine because
    reading stops at the pixel-data element.  The returned dict supports the
    reference's ``'RescaleSlope' in metadata`` checks (dataset.py:545).
    """
    try:
        with open(path, "rb") as f:
            head = f.read(132)
            if len(head) >= 132 and head[128:132] == b"DICM":
                pass                               # standard preamble
            else:
                f.seek(0)                          # headerless stream

            out: Dict[str, Any] = {}
            explicit = True
            transfer_syntax = _EXPLICIT_LE
            # File-meta group (0002) is always explicit little-endian.
            while True:
                pos = f.tell()
                tag = _read_tag(f)
                if tag is None:
                    return out
                f.seek(pos)
                if tag[0] != 0x0002:
                    break
                vr = None
                f.seek(pos + 4)
                vr = f.read(2)
                if vr in _LONG_VRS:
                    f.seek(2, io.SEEK_CUR)
                    length = struct.unpack("<I", f.read(4))[0]
                else:
                    length = struct.unpack("<H", f.read(2))[0]
                raw = f.read(length)
                if tag == (0x0002, 0x0010):
                    transfer_syntax = raw.decode(
                        "ascii", "ignore").strip("\x00")
            explicit = transfer_syntax != _IMPLICIT_LE

            while _walk_element(f, explicit, out) is not None:
                pass
            return out
    except (struct.error, OSError) as e:
        # a mid-element EOF or bad length field must surface as a clean
        # per-file error, never a bare struct crash the loader can't
        # attribute to a path
        raise ValueError(f"{path}: truncated or corrupt DICOM ({e})") from e


def write_dicom_ct_header(path: str, *, rescale_slope: float = 1.0,
                          rescale_intercept: float = -1024.0,
                          photometric: str = "MONOCHROME2",
                          bits_stored: int = 12,
                          implicit: bool = False) -> None:
    """Write a minimal-but-valid DICOM part-10 file carrying the CT header
    tags ``preprocessing_with_metadata`` consumes (fixture synthesis — the
    hospital data itself is private)."""
    def _pad(s: str) -> bytes:
        b = s.encode("ascii")
        return b + b" " if len(b) % 2 else b

    def _el_explicit(group, elem, vr, val: bytes) -> bytes:
        if len(val) % 2:
            val += b"\x00" if vr == "UI" else b" "
        head = struct.pack("<HH", group, elem) + vr.encode()
        if vr.encode() in _LONG_VRS:
            return head + b"\x00\x00" + struct.pack("<I", len(val)) + val
        return head + struct.pack("<H", len(val)) + val

    def _el_implicit(group, elem, val: bytes) -> bytes:
        if len(val) % 2:
            val += b" "
        return struct.pack("<HHI", group, elem, len(val)) + val

    syntax = _IMPLICIT_LE if implicit else _EXPLICIT_LE
    meta = b"".join([
        _el_explicit(0x0002, 0x0010, "UI", syntax.encode() + b"\x00"),
    ])
    meta = _el_explicit(0x0002, 0x0000, "UL",
                        struct.pack("<I", len(meta))) + meta

    mk = (lambda g, e, vr, v: _el_implicit(g, e, v)) if implicit else \
        _el_explicit
    body = b"".join([
        mk(0x0008, 0x0060, "CS", _pad("CT")),
        mk(0x0028, 0x0004, "CS", _pad(photometric)),
        mk(0x0028, 0x0101, "US", struct.pack("<H", bits_stored)),
        mk(0x0028, 0x1052, "DS", _pad(f"{rescale_intercept:g}")),
        mk(0x0028, 0x1053, "DS", _pad(f"{rescale_slope:g}")),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


# ---------------------------------------------------------------------------
# NRRD
# ---------------------------------------------------------------------------

_NRRD_DTYPES = {
    "signed char": np.int8, "int8": np.int8, "int8_t": np.int8,
    "uchar": np.uint8, "unsigned char": np.uint8, "uint8": np.uint8,
    "uint8_t": np.uint8,
    "short": np.int16, "short int": np.int16, "signed short": np.int16,
    "int16": np.int16, "int16_t": np.int16,
    "ushort": np.uint16, "unsigned short": np.uint16, "uint16": np.uint16,
    "uint16_t": np.uint16,
    "int": np.int32, "signed int": np.int32, "int32": np.int32,
    "int32_t": np.int32,
    "uint": np.uint32, "unsigned int": np.uint32, "uint32": np.uint32,
    "uint32_t": np.uint32,
    "longlong": np.int64, "int64": np.int64, "int64_t": np.int64,
    "ulonglong": np.uint64, "uint64": np.uint64, "uint64_t": np.uint64,
    "float": np.float32, "double": np.float64,
}


def read_nrrd(path: str) -> Tuple[np.ndarray, Dict[str, str]]:
    """Read an NRRD file (``nrrd.read`` equivalent, dataset.py:265-266).

    Returns (array, header) with pynrrd's default Fortran index order:
    ``array.shape == sizes`` as listed in the header (fastest axis first).
    Supports raw / gzip encodings, little-endian data.
    """
    with open(path, "rb") as f:
        blob = f.read()
    nl = blob.find(b"\n")
    if nl < 0:
        raise ValueError(f"{path}: truncated NRRD (no header line)")
    magic = blob[:nl].decode("ascii", "ignore").strip()
    if not magic.startswith("NRRD"):
        raise ValueError(f"{path}: not an NRRD file ({magic!r})")
    header: Dict[str, str] = {}
    pos = nl + 1
    while True:
        nl = blob.find(b"\n", pos)
        if nl < 0:
            raise ValueError(
                f"{path}: truncated NRRD (header never terminated)")
        line = blob[pos:nl].decode("ascii", "ignore").rstrip("\r")
        pos = nl + 1
        if line == "":
            break                                  # header/data separator
        if line.startswith("#"):
            continue
        if ":=" in line:
            k, v = line.split(":=", 1)
        elif ": " in line:
            k, v = line.split(": ", 1)
        else:
            continue
        header[k.strip()] = v.strip()

    dtype = _NRRD_DTYPES.get(header.get("type", "").lower())
    if dtype is None:
        raise ValueError(f"{path}: unsupported NRRD type {header.get('type')}")
    if "sizes" not in header:
        raise ValueError(f"{path}: NRRD header missing 'sizes'")
    sizes = tuple(int(s) for s in header["sizes"].split())
    if header.get("endian", "little") == "big":
        dtype = np.dtype(dtype).newbyteorder(">")
    enc = header.get("encoding", "raw").lower()
    payload = blob[pos:]
    try:
        if enc in ("gzip", "gz"):
            payload = zlib.decompress(payload, zlib.MAX_WBITS | 32)
        elif enc in ("ascii", "text", "txt"):
            arr = np.array(payload.split(), dtype=np.dtype(dtype))
            return arr.reshape(sizes, order="F"), header
        elif enc != "raw":
            raise ValueError(f"{path}: unsupported NRRD encoding {enc}")
        count = int(np.prod(sizes))
        arr = np.frombuffer(payload, dtype=dtype, count=count)
        return arr.reshape(sizes, order="F"), header
    except (zlib.error, EOFError) as e:
        raise ValueError(f"{path}: truncated or corrupt NRRD data "
                         f"({e})") from e
    except ValueError as e:
        if str(e).startswith(path):
            raise
        # frombuffer/reshape size mismatches → attribute to the file
        raise ValueError(f"{path}: NRRD data does not match header sizes "
                         f"{sizes} ({e})") from e


def write_nrrd(path: str, arr: np.ndarray, encoding: str = "gzip") -> None:
    """Write an NRRD0004 file (fixture synthesis; Fortran index order —
    ``sizes`` lists ``arr.shape`` fastest axis first like pynrrd)."""
    arr = np.asarray(arr)
    inv = {np.dtype(np.int8): "int8", np.dtype(np.uint8): "uint8",
           np.dtype(np.int16): "short", np.dtype(np.uint16): "ushort",
           np.dtype(np.int32): "int", np.dtype(np.uint32): "uint",
           np.dtype(np.int64): "int64", np.dtype(np.uint64): "uint64",
           np.dtype(np.float32): "float", np.dtype(np.float64): "double"}
    header = [
        "NRRD0004",
        f"type: {inv[arr.dtype]}",
        f"dimension: {arr.ndim}",
        f"sizes: {' '.join(str(s) for s in arr.shape)}",
        f"encoding: {encoding}",
        "endian: little",
    ]
    payload = arr.tobytes(order="F")
    if encoding == "gzip":
        payload = gzip.compress(payload)
    elif encoding != "raw":
        raise ValueError(f"unsupported encoding {encoding}")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n\n").encode("ascii"))
        f.write(payload)


def nrrd_mask_to_zyx(mask: np.ndarray) -> np.ndarray:
    """NRRD (X, Y, Z) Fortran order → (Z, Y, X) to match ``read_nifti`` /
    ``sitk.GetArrayFromImage`` (dataset.py:262)."""
    if mask.ndim != 3:
        raise ValueError(f"expected 3-D mask, got {mask.shape}")
    return np.ascontiguousarray(mask.transpose(2, 1, 0))
