"""Minimal DICOM codec (reader + writer) — replaces pydicom, which is not in
this image. Supports what CT slice IO needs:

  * Part-10 files (128-byte preamble + 'DICM') and raw datasets
  * Explicit / Implicit VR Little Endian transfer syntaxes (uncompressed)
  * int16/uint16 single-frame PixelData
  * modality rescale (slope / intercept) -> HU, with the -2000 air sentinel
    zeroed (reference create_datasets/Mayo.py:19-43)
  * rewriting PixelData of an existing file (reference utils.py:173-197
    save_dicom) and generating synthetic fixtures for tests (SURVEY.md §4)

A C++ batch decoder (native/dicom_codec.cc) accelerates bulk training IO;
this module is the reference implementation and fallback.
"""

from __future__ import annotations

import dataclasses
import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np

# transfer syntaxes
IMPLICIT_VR_LE = "1.2.840.10008.1.2"
EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"

# VRs with 4-byte length (and 2 reserved bytes) in explicit encoding
_LONG_VRS = {b"OB", b"OW", b"OF", b"OD", b"OL", b"SQ", b"UC", b"UR", b"UT", b"UN"}

TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_BITS_ALLOCATED = (0x0028, 0x0100)
TAG_PIXEL_REPRESENTATION = (0x0028, 0x0103)
TAG_RESCALE_INTERCEPT = (0x0028, 0x1052)
TAG_RESCALE_SLOPE = (0x0028, 0x1053)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)
TAG_TRANSFER_SYNTAX = (0x0002, 0x0010)


@dataclasses.dataclass
class DicomImage:
    path: Optional[str]
    elements: Dict[Tuple[int, int], bytes]  # raw values, file order preserved
    pixel_offset: int  # byte offset of PixelData value in the file
    pixel_length: int
    transfer_syntax: str
    raw: bytes

    # -- decoded header fields --
    @property
    def rows(self) -> int:
        return int(np.frombuffer(self.elements[TAG_ROWS], "<u2")[0])

    @property
    def cols(self) -> int:
        return int(np.frombuffer(self.elements[TAG_COLS], "<u2")[0])

    @property
    def bits_allocated(self) -> int:
        return int(np.frombuffer(self.elements[TAG_BITS_ALLOCATED], "<u2")[0])

    @property
    def pixel_representation(self) -> int:
        el = self.elements.get(TAG_PIXEL_REPRESENTATION)
        return int(np.frombuffer(el, "<u2")[0]) if el else 0

    @property
    def rescale_slope(self) -> float:
        el = self.elements.get(TAG_RESCALE_SLOPE)
        return float(el.decode("ascii").strip("\x00 ")) if el else 1.0

    @property
    def rescale_intercept(self) -> float:
        el = self.elements.get(TAG_RESCALE_INTERCEPT)
        return float(el.decode("ascii").strip("\x00 ")) if el else 0.0

    @property
    def pixel_array(self) -> np.ndarray:
        if self.bits_allocated != 16:
            raise ValueError(f"only 16-bit pixels supported, got {self.bits_allocated}")
        dtype = "<i2" if self.pixel_representation == 1 else "<u2"
        buf = self.raw[self.pixel_offset : self.pixel_offset + self.pixel_length]
        return np.frombuffer(buf, dtype).reshape(self.rows, self.cols).copy()


def _skip_undefined_sequence(buf: bytes, pos: int) -> int:
    """Skip an SQ / pixel-sequence with undefined length; return new pos."""
    while pos + 8 <= len(buf):
        group, elem = struct.unpack_from("<HH", buf, pos)
        length = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        if (group, elem) == (0xFFFE, 0xE0DD):  # sequence delimiter
            return pos
        if (group, elem) == (0xFFFE, 0xE000) and length == 0xFFFFFFFF:
            pos = _skip_undefined_item(buf, pos)
        else:
            pos += length
    return pos


def _skip_undefined_item(buf: bytes, pos: int) -> int:
    while pos + 8 <= len(buf):
        group, elem = struct.unpack_from("<HH", buf, pos)
        length = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        if (group, elem) == (0xFFFE, 0xE00D):  # item delimiter
            return pos
        pos += length if length != 0xFFFFFFFF else 0
    return pos


def _parse_dataset(buf: bytes, pos: int, explicit: bool, stop_group=None):
    """Yields (tag, value_offset, length, value_bytes); stops at buffer end or
    when the group exceeds stop_group."""
    out = {}
    pixel_offset = pixel_length = 0
    n = len(buf)
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, pos)
        if stop_group is not None and group > stop_group:
            break
        tag = (group, elem)
        if explicit and group != 0xFFFE:
            vr = buf[pos + 4 : pos + 6]
            if vr in _LONG_VRS:
                length = struct.unpack_from("<I", buf, pos + 8)[0]
                hdr = 12
            else:
                length = struct.unpack_from("<H", buf, pos + 6)[0]
                hdr = 8
        else:
            vr = b"UN"
            length = struct.unpack_from("<I", buf, pos + 4)[0]
            hdr = 8
        val_off = pos + hdr

        if length == 0xFFFFFFFF:
            pos = _skip_undefined_sequence(buf, val_off)
            continue
        if tag == TAG_PIXEL_DATA:
            pixel_offset, pixel_length = val_off, length
        else:
            out[tag] = buf[val_off : val_off + length]
        pos = val_off + length
    return out, pos, pixel_offset, pixel_length


def read_dicom(path: str) -> DicomImage:
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0
    transfer_syntax = EXPLICIT_VR_LE
    elements: Dict[Tuple[int, int], bytes] = {}
    if len(buf) > 132 and buf[128:132] == b"DICM":
        pos = 132
        # file meta group (0002): always explicit VR LE
        meta, pos, _, _ = _parse_dataset(buf, pos, explicit=True, stop_group=0x0002)
        elements.update(meta)
        ts = meta.get(TAG_TRANSFER_SYNTAX)
        if ts is not None:
            transfer_syntax = ts.decode("ascii").rstrip("\x00 ")
    if transfer_syntax == IMPLICIT_VR_LE:
        explicit = False
    elif transfer_syntax == EXPLICIT_VR_LE:
        explicit = True
    else:
        raise ValueError(f"unsupported transfer syntax {transfer_syntax!r} in {path}")
    body, pos, pixel_offset, pixel_length = _parse_dataset(buf, pos, explicit)
    elements.update(body)
    if pixel_offset == 0:
        raise ValueError(f"no PixelData in {path}")
    return DicomImage(
        path=path, elements=elements, pixel_offset=pixel_offset,
        pixel_length=pixel_length, transfer_syntax=transfer_syntax, raw=buf,
    )


def get_pixels_hu(path_or_img) -> np.ndarray:
    """DICOM -> int16 HU array (reference Mayo.py:19-43 semantics: -2000
    sentinel zeroed, slope/intercept applied, int16 output)."""
    img = path_or_img if isinstance(path_or_img, DicomImage) else read_dicom(path_or_img)
    arr = img.pixel_array.astype(np.int16)
    arr[arr == -2000] = 0
    slope, intercept = img.rescale_slope, img.rescale_intercept
    if slope != 1:
        arr = (slope * arr.astype(np.float64)).astype(np.int16)
    arr = arr + np.int16(intercept)
    return arr.astype(np.int16)


def write_dicom_like(src_path: str, hu_pixels: np.ndarray, out_path: str) -> None:
    """Rewrite the PixelData of `src_path` with new HU pixels (inverse
    slope/intercept applied), preserving every other byte — the reference
    save_dicom behavior (utils.py:173-197)."""
    img = read_dicom(src_path)
    slope, intercept = img.rescale_slope, img.rescale_intercept
    raw = ((hu_pixels.astype(np.float64) - intercept) / slope).astype(
        "<i2" if img.pixel_representation == 1 else "<u2"
    )
    payload = raw.tobytes()
    if len(payload) != img.pixel_length:
        raise ValueError(
            f"pixel payload size {len(payload)} != original {img.pixel_length}"
        )
    buf = bytearray(img.raw)
    buf[img.pixel_offset : img.pixel_offset + img.pixel_length] = payload
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(bytes(buf))


def _el(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr != b"UI" else b"\x00"
    if vr in _LONG_VRS:
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def write_synthetic_dicom(
    path: str,
    pixel_array: np.ndarray,
    slope: float = 1.0,
    intercept: float = -1024.0,
    signed: bool = False,
) -> None:
    """Emit a minimal valid Part-10 explicit-VR-LE CT slice (test fixture;
    fills the role of PHI-free synthetic Mayo data, SURVEY.md §4)."""
    rows, cols = pixel_array.shape
    dtype = "<i2" if signed else "<u2"
    payload = pixel_array.astype(dtype).tobytes()

    ts = EXPLICIT_VR_LE.encode("ascii")
    sop_class = b"1.2.840.10008.5.1.4.1.1.2"  # CT Image Storage
    meta = b"".join([
        _el(0x0002, 0x0001, b"OB", b"\x00\x01"),
        _el(0x0002, 0x0002, b"UI", sop_class),
        _el(0x0002, 0x0003, b"UI", b"1.2.3.4.5.6"),
        _el(0x0002, 0x0010, b"UI", ts),
    ])
    meta_len = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta)))

    def ds_str(x: float) -> bytes:
        return f"{x:g}".encode("ascii")

    body = b"".join([
        _el(0x0008, 0x0016, b"UI", sop_class),
        _el(0x0008, 0x0018, b"UI", b"1.2.3.4.5.6"),
        _el(0x0008, 0x0060, b"CS", b"CT"),
        _el(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        _el(0x0028, 0x0004, b"CS", b"MONOCHROME2"),
        _el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el(0x0028, 0x0101, b"US", struct.pack("<H", 16)),
        _el(0x0028, 0x0102, b"US", struct.pack("<H", 15)),
        _el(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0)),
        _el(0x0028, 0x1052, b"DS", ds_str(intercept)),
        _el(0x0028, 0x1053, b"DS", ds_str(slope)),
        _el(0x7FE0, 0x0010, b"OW", payload),
    ])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta_len + meta + body)
