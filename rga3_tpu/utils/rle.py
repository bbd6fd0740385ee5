"""Pure-numpy COCO RLE mask codec.

Replaces the reference's pycocotools.mask dependency (RLE decode in every
VOS dataset, e.g. ref utils/mevis_dataset.py, refer_vos_dataset.py;
evaluation/videoinfer/inference_videoinfer.py). Implements the compressed
LEB128-style COCO string format and uncompressed {"counts": [...]} form.
"""
from __future__ import annotations

from typing import Any, Dict, List, Union

import numpy as np


def _decode_counts(s: Union[str, bytes]) -> List[int]:
    """COCO compressed RLE string -> counts list."""
    if isinstance(s, str):
        s = s.encode("ascii")
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
