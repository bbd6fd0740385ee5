"""Ref-DAVIS17 evaluation: per-object palette PNGs + the official DAVIS
protocol (J/F statistics per object, averaged over annotators).

Rebuild of ref evaluation/refdavis/ (inference_davis.py writes per-
expression masks; post_process_davis.py merges objects into palette PNGs;
davis2017/ computes global J&F means). The metric math is in
jf_metrics.py; this module adds the DAVIS-specific orchestration.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .jf_metrics import db_eval_boundary, db_eval_iou

DAVIS_PALETTE = np.zeros((256, 3), np.uint8)
for i in range(256):
    # standard VOC/DAVIS palette generation
    c = i
    r = g = b = 0
    for j in range(8):
        r |= ((c >> 0) & 1) << (7 - j)
        g |= ((c >> 1) & 1) << (7 - j)
        b |= ((c >> 2) & 1) << (7 - j)
        c >>= 3
    DAVIS_PALETTE[i] = [r, g, b]


def merge_objects_to_palette(
    per_object_masks: Sequence[np.ndarray],  # list of (T, H, W) bool
) -> np.ndarray:
    """Merge per-object binary masks into (T, H, W) uint8 id maps; later
    objects overwrite earlier ones on overlap (ref post_process_davis)."""
    t, h, w = per_object_masks[0].shape
    out = np.zeros((t, h, w), np.uint8)
    for oid, m in enumerate(per_object_masks, start=1):
        out[m.astype(bool)] = oid
    return out


def save_palette_pngs(id_maps: np.ndarray, names: Sequence[str],
                      out_dir: str) -> None:
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for name, frame in zip(names, id_maps):
        img = Image.fromarray(frame, mode="P")
        img.putpalette(DAVIS_PALETTE.reshape(-1).tolist())
        img.save(os.path.join(out_dir, f"{name}.png"))


def evaluate_davis_sequence(
    gt_id_maps: np.ndarray,  # (T, H, W) uint8, 0 = background
    pred_id_maps: np.ndarray,
    object_ids: Optional[Sequence[int]] = None,
) -> Dict[str, float]:
    """Per-sequence J&F means over objects (DAVIS protocol: first and last
    frames excluded from scoring)."""
    if object_ids is None:
        object_ids = sorted(set(np.unique(gt_id_maps)) - {0})
    js, fs = [], []
    sl = slice(1, -1) if gt_id_maps.shape[0] > 2 else slice(None)
    for oid in object_ids:
        gt = gt_id_maps[sl] == oid
        pred = pred_id_maps[sl] == oid
        js.append(float(np.mean(db_eval_iou(gt, pred))))
        fs.append(float(np.mean(db_eval_boundary(gt, pred))))
    j = float(np.mean(js)) if js else 0.0
    f = float(np.mean(fs)) if fs else 0.0
    return {"J": j, "F": f, "J&F": (j + f) / 2}


def evaluate_davis(
    results: Dict[str, Dict[str, np.ndarray]],
    # seq -> {"gt": (T,H,W) ids, "pred": (T,H,W) ids}
) -> Dict[str, float]:
    per_seq = [
        evaluate_davis_sequence(v["gt"], v["pred"])
        for v in results.values()
    ]
    if not per_seq:
        return {"J": 0.0, "F": 0.0, "J&F": 0.0, "n": 0}
    return {
        "J": float(np.mean([s["J"] for s in per_seq])),
        "F": float(np.mean([s["F"] for s in per_seq])),
        "J&F": float(np.mean([s["J&F"] for s in per_seq])),
        "n": len(per_seq),
    }
