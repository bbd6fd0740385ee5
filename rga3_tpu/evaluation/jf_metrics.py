"""J&F video-segmentation metrics (numpy, no cv2/skimage dependency).

Numerically equivalent to the reference's DAVIS-style metrics
(ref: evaluation/mevis_val_u/metrics.py:6-56 — db_eval_iou J, f_measure
boundary F with 1px seg2bmap boundaries and disk-dilated matching). The
disk structuring element matches skimage.morphology.disk; dilation is a
binary max-filter (what cv2.dilate computes on 0/1 masks).
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np


def db_eval_iou(
    annotation: np.ndarray,
    segmentation: np.ndarray,
    void_pixels: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Jaccard index over trailing (H, W) axes; empty∩empty == 1."""
    annotation = annotation.astype(bool)
    segmentation = segmentation.astype(bool)
    if void_pixels is None:
        void = np.zeros_like(segmentation)
    else:
        void = void_pixels.astype(bool)
    inters = np.sum((segmentation & annotation) & ~void, axis=(-2, -1))
    union = np.sum((segmentation | annotation) & ~void, axis=(-2, -1))
    j = inters / np.maximum(union, 1)
    close_zero = np.isclose(union, 0)
    if j.ndim == 0:
        return np.asarray(1.0) if close_zero else j
    j = np.where(close_zero, 1.0, j)
    return j


def _disk(radius: int) -> np.ndarray:
    """skimage.morphology.disk: L2 ball of given integer radius."""
    r = int(radius)
    y, x = np.ogrid[-r : r + 1, -r : r + 1]
    return (x * x + y * y <= r * r).astype(np.uint8)


def _hdilate(mask: np.ndarray, k: int) -> np.ndarray:
    """Horizontal binary dilation with window [x-k, x+k] via prefix sums."""
    if k == 0:
        return mask.copy()
    c = np.cumsum(mask, axis=1, dtype=np.int64)
    w = mask.shape[1]
    hi = np.minimum(np.arange(w) + k, w - 1)
    tot = c[:, hi]
    tot[:, k + 1:] -= c[:, : w - k - 1]
    return tot > 0


def _binary_dilate_offsets(
    mask: np.ndarray, selem: np.ndarray
) -> np.ndarray:
    """Shifted-OR dilation — reference implementation for arbitrary selems
    (slow: one pass per nonzero offset). Used only as the correctness
    oracle in tests and as the fallback for non-disk selems."""
    h, w = mask.shape
    r = selem.shape[0] // 2
    out = np.zeros_like(mask, dtype=bool)
    ys, xs = np.nonzero(selem)
    for dy, dx in zip(ys - r, xs - r):
        src_y0, src_y1 = max(0, -dy), min(h, h - dy)
        src_x0, src_x1 = max(0, -dx), min(w, w - dx)
        dst_y0, dst_y1 = max(0, dy), min(h, h + dy)
        dst_x0, dst_x1 = max(0, dx), min(w, w + dx)
        out[dst_y0:dst_y1, dst_x0:dst_x1] |= mask[
            src_y0:src_y1, src_x0:src_x1
        ].astype(bool)
    return out


def _binary_dilate(mask: np.ndarray, selem: np.ndarray) -> np.ndarray:
    """Binary dilation (max-filter), equivalent to cv2.dilate on 0/1 masks.

    Fast paths (the eval workers run this per frame per object at up to
    1080p, so the old per-offset python loop was the J&F bottleneck):
    1. cv2.dilate when importable — exactly what the reference's DAVIS
       metrics call (ref evaluation/mevis_val_u/metrics.py:60-80).
    2. Pure numpy O(r) decomposition: each selem row is a contiguous
       symmetric run (true for L2 disks), so dilation = OR over rows of a
       prefix-sum horizontal dilation shifted vertically.
    """
    mask = mask.astype(bool)
    try:
        import cv2

        return cv2.dilate(
            mask.astype(np.uint8), selem.astype(np.uint8)
        ).astype(bool)
    except ImportError:
        pass
    h = mask.shape[0]
    r = selem.shape[0] // 2
    # check every row is a contiguous run centred on the middle column
    rows = []
    for dy in range(-r, r + 1):
        xs = np.nonzero(selem[dy + r])[0]
        if xs.size == 0:
            rows.append(None)
            continue
        k = int(xs.max() - r)
        if k != r - int(xs.min()) or xs.size != 2 * k + 1:
            return _binary_dilate_offsets(mask, selem)
        rows.append(k)
    out = np.zeros_like(mask)
    cache: dict = {}
    for dy in range(-r, r + 1):
        k = rows[dy + r]
        if k is None:
            continue
        if k not in cache:
            cache[k] = _hdilate(mask, k)
        hd = cache[k]
        if dy >= 0:
            out[dy:] |= hd[: h - dy]
        else:
            out[: h + dy] |= hd[-dy:]
    return out


def seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-pixel-wide boundary map (ref _seg2bmap)."""
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def f_measure(
    foreground_mask: np.ndarray,
    gt_mask: np.ndarray,
    void_pixels: Optional[np.ndarray] = None,
    bound_th: float = 0.008,
) -> float:
    if void_pixels is None:
        void = np.zeros_like(foreground_mask, dtype=bool)
    else:
        void = void_pixels.astype(bool)
    bound_pix = (
        bound_th
        if bound_th >= 1
        else int(np.ceil(bound_th * np.linalg.norm(foreground_mask.shape)))
    )
    fg_boundary = seg2bmap(foreground_mask.astype(bool) & ~void)
    gt_boundary = seg2bmap(gt_mask.astype(bool) & ~void)
    selem = _disk(bound_pix)
    fg_dil = _binary_dilate(fg_boundary, selem)
    gt_dil = _binary_dilate(gt_boundary, selem)

    gt_match = gt_boundary & fg_dil
    fg_match = fg_boundary & gt_dil
    n_fg = fg_boundary.sum()
    n_gt = gt_boundary.sum()
    if n_fg == 0 and n_gt > 0:
        precision, recall = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall = 1.0, 1.0
    else:
        precision = fg_match.sum() / float(n_fg)
        recall = gt_match.sum() / float(n_gt)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def db_eval_boundary(
    annotation: np.ndarray,
    segmentation: np.ndarray,
    void_pixels: Optional[np.ndarray] = None,
    bound_th: float = 0.008,
):
    if annotation.ndim == 3:
        return np.asarray(
            [
                f_measure(
                    segmentation[i], annotation[i],
                    None if void_pixels is None else void_pixels[i],
                    bound_th,
                )
                for i in range(annotation.shape[0])
            ]
        )
    return f_measure(segmentation, annotation, void_pixels, bound_th)


def db_statistics(per_frame_values: np.ndarray):
    """(mean, recall, decay) of a per-frame measure — the official DAVIS
    protocol statistics (ref evaluation/refdavis/davis2017/utils.py:135-160):
    recall = fraction of frames above 0.5; decay = mean of the first
    quarter of frames minus mean of the last quarter."""
    v = np.asarray(per_frame_values, np.float64)
    mean = float(np.nanmean(v))
    recall = float(np.nanmean(v > 0.5))
    ids = np.round(np.linspace(1, len(v), 5) + 1e-10) - 1
    ids = ids.astype(int)
    bins = [v[ids[i]:ids[i + 1] + 1] for i in range(4)]
    decay = float(np.nanmean(bins[0]) - np.nanmean(bins[3]))
    return mean, recall, decay


def r2vos_accuracy(
    gt_masks: np.ndarray, pred_masks: np.ndarray
) -> np.ndarray:
    """Per-frame pixel accuracy mean(gt == pred)
    (ref: evaluation/revos/metrics.py:6-21 get_r2vos_accuracy)."""
    gt_masks = np.asarray(gt_masks)
    pred_masks = np.asarray(pred_masks)
    assert gt_masks.shape == pred_masks.shape, (
        gt_masks.shape, pred_masks.shape,
    )
    flat = (gt_masks.astype(np.uint8) == pred_masks.astype(np.uint8))
    return flat.reshape(flat.shape[0], -1).mean(axis=1).astype(np.float64)


def r2vos_robustness(
    gt_masks: np.ndarray,
    pred_masks: np.ndarray,
    foreground_masks: np.ndarray,
) -> np.ndarray:
    """Per-frame hallucination robustness: max(1 - FP/(fg + 1e-6), 0),
    where FP = predicted pixels outside the GT and fg = the video's
    foreground-mask area (ref: evaluation/revos/metrics.py:23-41
    get_r2vos_robustness)."""
    gt_masks = np.asarray(gt_masks)
    pred_masks = np.asarray(pred_masks)
    foreground_masks = np.asarray(foreground_masks)
    assert (
        gt_masks.shape == pred_masks.shape == foreground_masks.shape
    ), (gt_masks.shape, pred_masks.shape, foreground_masks.shape)
    out = []
    for gt, pred, fore in zip(gt_masks, pred_masks, foreground_masks):
        neg = ((1 - gt.astype(np.int64)) * pred.astype(np.int64)).sum()
        pos = fore.astype(np.int64).sum()
        out.append(max(1.0 - neg / (pos + 1e-6), 0.0))
    return np.asarray(out, np.float64)


def jf_score(
    annotations: np.ndarray, segmentations: np.ndarray
) -> dict:
    """Per-video J, F, J&F means over (T, H, W) binary masks."""
    j = db_eval_iou(annotations, segmentations)
    f = db_eval_boundary(annotations, segmentations)
    return {
        "J": float(np.mean(j)),
        "F": float(np.mean(f)),
        "J&F": float((np.mean(j) + np.mean(f)) / 2),
    }
