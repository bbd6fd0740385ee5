"""Image segmentation validation: gIoU / cIoU over ReasonSeg-val and the
RefCOCO-family splits (ref: evaluation/eval_img/val.py + train_joint.py
validate :586-648; metric math at utils/utils.py:125-152).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.meters import intersection_and_union


def evaluate_image_masks(
    preds: Sequence[np.ndarray],  # (H, W) bool per sample
    gts: Sequence[np.ndarray],  # (H, W) {0,1,255} per sample
) -> Dict[str, float]:
    """gIoU = mean per-sample IoU of the foreground class; cIoU = cumulative
    intersection / cumulative union (ref train_joint.py:614-641)."""
    inter_sum = np.zeros(2)
    union_sum = np.zeros(2)
    accs = []
    for pred, gt in zip(preds, gts):
        i, u, _ = intersection_and_union(
            pred.astype(np.int64), gt.astype(np.int64), 2, 255
        )
        inter_sum += i
        union_sum += u
        accs.append(i / np.maximum(u, 1e-5))
    acc_iou = np.mean(np.stack(accs), axis=0)
    ciou = inter_sum / np.maximum(union_sum, 1e-5)
    return {
        "gIoU": float(acc_iou[1]),
        "cIoU": float(ciou[1]),
        "n": len(accs),
    }


def run_refer_seg_val(
    segmentor,
    base_dir: str,
    dataset: str = "refcoco",
    split: str = "val",
    max_samples: Optional[int] = None,
) -> Dict[str, float]:
    """RefCOCO-family validation splits (val/testA/testB, refcocog umd
    val/test) through the segmentor — the eval_img driver's other 9 splits
    (ref: evaluation/eval_img/run_val.sh:6-19)."""
    import os as _os

    from PIL import Image

    from ..data.refer import REFER

    split_by = "umd" if dataset == "refcocog" else "unc"
    api = REFER(_os.path.join(base_dir, "refer_seg"), dataset, split_by)
    ref_ids = api.getRefIds(split=split)
    if max_samples:
        ref_ids = ref_ids[:max_samples]
    preds, gts = [], []
    for rid in ref_ids:
        ref = api.loadRefs(rid)[0]
        img_info = api.Imgs[ref["image_id"]]
        img_dir = (
            "images/saiapr_tc-12" if dataset == "refclef"
            else "images/mscoco/images/train2014"
        )
        path = _os.path.join(api.data_root, img_dir, img_info["file_name"])
        img = np.asarray(Image.open(path).convert("RGB"))
        sent = ref["sentences"][0]["sent"]
        masks = segmentor.segment_video([img], sent)
        preds.append(masks[0])
        gts.append(api.get_mask(ref))
    return evaluate_image_masks(preds, gts)


VAL_SPLITS = [
    ("refcoco", "val"), ("refcoco", "testA"), ("refcoco", "testB"),
    ("refcoco+", "val"), ("refcoco+", "testA"), ("refcoco+", "testB"),
    ("refcocog", "val"), ("refcocog", "test"),
]


def run_all_image_seg_vals(
    segmentor, base_dir: str, max_samples: Optional[int] = None
) -> Dict[str, Dict[str, float]]:
    """All 12 reference validation splits (ReasonSeg val/test + the
    RefCOCO family), skipping datasets not on disk."""
    out: Dict[str, Dict[str, float]] = {}
    for split in ["val", "test"]:
        try:
            out[f"ReasonSeg|{split}"] = run_reason_seg_val(
                segmentor, base_dir, split, max_samples
            )
        except Exception as e:
            out[f"ReasonSeg|{split}"] = {"error": str(e)}
    for ds, split in VAL_SPLITS:
        try:
            out[f"{ds}|{split}"] = run_refer_seg_val(
                segmentor, base_dir, ds, split, max_samples
            )
        except FileNotFoundError:
            continue
        except Exception as e:
            out[f"{ds}|{split}"] = {"error": str(e)}
    return out


def run_reason_seg_val(
    segmentor,
    base_dir: str,
    split: str = "val",
    max_samples: Optional[int] = None,
) -> Dict[str, float]:
    """ReasonSeg validation through the video segmentor (images are
    pseudo-videos of one frame; ref VideoValDataset utils/dataset.py:411+)."""
    from PIL import Image

    from ..data.datasets.image_seg import get_mask_from_json

    images = sorted(
        glob.glob(
            os.path.join(base_dir, "reason_seg", "ReasonSeg", split, "*.jpg")
        )
    )
    if not images:
        raise FileNotFoundError(
            f"no ReasonSeg {split} images under {base_dir}"
        )
    if max_samples:
        images = images[:max_samples]
    preds, gts = [], []
    for path in images:
        img = np.asarray(Image.open(path).convert("RGB"))
        gt, comments, is_sentence = get_mask_from_json(
            path.replace(".jpg", ".json"), *img.shape[:2]
        )
        text = comments[0] if isinstance(comments, list) else comments
        masks = segmentor.segment_video([img], text)
        preds.append(masks[0])
        gts.append(gt)
    return evaluate_image_masks(preds, gts)
