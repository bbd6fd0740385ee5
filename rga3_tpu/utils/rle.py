"""COCO RLE mask codec: native C++ (ctypes) with a pure-numpy fallback.

Replaces the reference's pycocotools.mask dependency (RLE decode in every
VOS dataset, e.g. ref utils/mevis_dataset.py, refer_vos_dataset.py;
evaluation/videoinfer/inference_videoinfer.py) — pycocotools is itself a
C extension, so the hot codec stays native here too
(native/rle.cpp, built with g++ on first use like
runtime/connected_components.py). Implements the compressed LEB128-style
COCO string format and the uncompressed {"counts": [...]} form.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any, Dict, List, Optional, Union

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_SRC = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "native", "rle.cpp",
)


def _native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so_path = os.path.join(os.path.dirname(_SRC), "librle.so")
    try:
        if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rle_decode.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p,
        ]
        lib.rle_decode.restype = ctypes.c_int32
        lib.rle_encode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64,
        ]
        lib.rle_encode.restype = ctypes.c_int64
        lib.rle_from_string.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, i64p, ctypes.c_int64,
        ]
        lib.rle_from_string.restype = ctypes.c_int64
        lib.rle_to_string.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.rle_to_string.restype = ctypes.c_int64
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _decode_counts(s: Union[str, bytes]) -> List[int]:
    """COCO compressed RLE string -> counts list."""
    if isinstance(s, str):
        s = s.encode("ascii")
    lib = _native_lib()
    if lib is not None:
        buf = np.empty(len(s) + 1, np.int64)
        n = lib.rle_from_string(s, len(s), _i64p(buf), buf.size)
        if n >= 0:
            return buf[:n].tolist()
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _encode_counts(counts: List[int]) -> str:
    lib = _native_lib()
    if lib is not None:
        arr = np.asarray(counts, np.int64)
        out = ctypes.create_string_buffer(8 * max(1, arr.size) + 16)
        m = lib.rle_to_string(_i64p(arr), arr.size, out, len(out))
        if m >= 0:
            return out.raw[:m].decode("ascii")
    s = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return s.decode("ascii")


def decode(rle: Dict[str, Any]) -> np.ndarray:
    """RLE dict {"size": [h, w], "counts": str|list} -> (h, w) uint8 mask.
    COCO RLE is column-major."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _decode_counts(counts)
    lib = _native_lib()
    if lib is not None and h > 0 and w > 0:
        arr = np.asarray(counts, np.int64)
        out = np.empty((h, w), np.uint8)
        if lib.rle_decode(_i64p(arr), arr.size, h, w, _u8p(out)) == 0:
            return out
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T  # column-major


def encode(mask: np.ndarray) -> Dict[str, Any]:
    """(h, w) binary mask -> compressed RLE dict (column-major)."""
    h, w = mask.shape
    lib = _native_lib()
    if lib is not None and h > 0 and w > 0:
        m = np.ascontiguousarray(mask, np.uint8)
        counts = np.empty(h * w + 2, np.int64)
        n = lib.rle_encode(_u8p(m), h, w, _i64p(counts), counts.size)
        if n >= 0:
            return {
                "size": [h, w],
                "counts": _encode_counts(counts[:n].tolist()),
            }
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    # run lengths starting with zeros
    change = np.flatnonzero(np.diff(flat)) + 1
    boundaries = np.concatenate([[0], change, [len(flat)]])
    runs = np.diff(boundaries).tolist()
    if flat.size and flat[0] == 1:
        runs = [0] + runs
    return {"size": [h, w], "counts": _encode_counts([int(r) for r in runs])}


def area(rle: Dict[str, Any]) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _decode_counts(counts)
    return int(sum(counts[1::2]))


def to_bbox(rle: Dict[str, Any]) -> np.ndarray:
    """[x, y, w, h] of the mask's bounding box."""
    m = decode(rle)
    ys, xs = np.nonzero(m)
    if ys.size == 0:
        return np.zeros(4, np.float64)
    return np.asarray(
        [xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1],
        np.float64,
    )


def merge(rles: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Union of masks."""
    m = decode(rles[0])
    for r in rles[1:]:
        m |= decode(r)
    return encode(m)
