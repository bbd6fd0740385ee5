"""Connected components + hole filling (host-side native C++ via ctypes).

Replaces the reference's runtime-downloaded CUDA extension
(ref: model/sam2.py:4148-4175) with a compiled union-find library
(native/connected_components.cpp). The shared library is built on first
use with g++; a pure-numpy BFS fallback covers environments without a
toolchain.

`fill_holes_in_mask_scores` mirrors ref :4134-4146: background components
(score <= 0) with area <= max_area become foreground with score 0.1.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "connected_components.cpp",
)


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so_path = os.path.join(os.path.dirname(_SRC), "libcc.so")
    try:
        if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.connected_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def _cc_numpy(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """BFS fallback, 8-connectivity, one (H, W) plane."""
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    areas = np.zeros((h, w), np.int32)
    next_id = 1
    for y0 in range(h):
        for x0 in range(w):
            if not mask[y0, x0] or labels[y0, x0]:
                continue
            stack = [(y0, x0)]
            labels[y0, x0] = next_id
            pix = []
            while stack:
                y, x = stack.pop()
                pix.append((y, x))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = y + dy, x + dx
                        if (
                            0 <= ny < h and 0 <= nx < w
                            and mask[ny, nx] and not labels[ny, nx]
                        ):
                            labels[ny, nx] = next_id
                            stack.append((ny, nx))
            for y, x in pix:
                areas[y, x] = len(pix)
            next_id += 1
    return labels, areas


def get_connected_components(
    mask: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """mask: (N, H, W) or (N, 1, H, W) binary. Returns (labels, areas) of
    the same shape (int32), 8-connectivity."""
    squeeze = mask.ndim == 4
    if squeeze:
        mask = mask[:, 0]
    m = np.ascontiguousarray(mask.astype(np.uint8))
    n, h, w = m.shape
    labels = np.zeros_like(m, np.int32)
    areas = np.zeros_like(m, np.int32)
    lib = _build_lib()
    if lib is not None:
        lib.connected_components(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    else:
        for i in range(n):
            labels[i], areas[i] = _cc_numpy(m[i])
    if squeeze:
        labels = labels[:, None]
        areas = areas[:, None]
    return labels, areas


def fill_holes_in_mask_scores(
    mask_scores: np.ndarray, max_area: int
) -> np.ndarray:
    """(N, 1, H, W) or (N, H, W) float scores -> hole-filled scores
    (ref: model/sam2.py:4134-4146)."""
    assert max_area > 0, "max_area must be positive"
    background = mask_scores <= 0
    labels, areas = get_connected_components(background)
    is_hole = (labels > 0) & (areas <= max_area)
    out = mask_scores.copy()
    out[is_hole] = 0.1
    return out
