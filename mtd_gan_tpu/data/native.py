"""ctypes bridge to the native DICOM decoder (native/dicom_codec.cc).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; decode calls release the GIL, so the threaded train loader
(data.pipeline) overlaps decode with device compute. Falls back silently to
the pure-Python codec when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "dicom_codec.cc")
_LIB = os.path.join(_NATIVE_DIR, "libdicom_codec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_LIB):
            return None
        lib = ctypes.CDLL(_LIB)
        lib.dicom_decode_hu.restype = ctypes.c_int
        lib.dicom_decode_hu.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_hu(path: str, max_pixels: int = 4096 * 4096) -> Optional[np.ndarray]:
    """Decode a DICOM file to int16 HU via the native codec; None on any
    failure (caller falls back to the Python codec)."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    out = np.empty(max_pixels, np.int16)
    rows = ctypes.c_int(0)
    cols = ctypes.c_int(0)
    rc = lib.dicom_decode_hu(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.size, ctypes.byref(rows), ctypes.byref(cols),
    )
    if rc != 0:
        return None
    return out[: rows.value * cols.value].reshape(rows.value, cols.value).copy()
