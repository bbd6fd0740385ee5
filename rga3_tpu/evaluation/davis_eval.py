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

from .jf_metrics import db_eval_boundary, db_eval_iou, db_statistics

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
    per_object_masks: Sequence[np.ndarray],  # list of (T, H, W) float/bool
) -> np.ndarray:
    """Merge per-object masks into (T, H, W) uint8 id maps via the
    reference's argmax convention (ref post_process_davis.py:82-87):
    scores below 0.5 are zeroed, a constant-0.1 background plane is
    prepended, and argmax picks the object — so on an exact tie the
    LOWER object id wins (argmax returns the first maximum)."""
    masks = np.stack(
        [m.astype(np.float32) for m in per_object_masks]
    )  # (O, T, H, W)
    masks[masks < 0.5] = 0.0
    bg = np.full((1,) + masks.shape[1:], 0.1, np.float32)
    return np.argmax(
        np.concatenate([bg, masks], axis=0), axis=0
    ).astype(np.uint8)


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


def evaluate_davis_official(
    results: Dict[str, Dict[str, np.ndarray]],
    # seq -> {"gt": (T,H,W) ids, "pred": (T,H,W) ids}
    task: str = "unsupervised",
    max_n_proposals: int = 20,
) -> Dict[str, object]:
    """The official DAVIS evaluator's output tables (ref
    evaluation/refdavis/eval_davis.py:43-61 + davis2017/evaluation.py:
    66-101): per-(sequence, object) [M, R, D] statistics of the
    per-frame J and F values, and the global means
    [J&F-Mean, J-Mean, J-Recall, J-Decay, F-Mean, F-Recall, F-Decay].

    Ref-DAVIS runs the evaluator at its DEFAULT task='unsupervised'
    (run eval_davis.py with no --task): ALL frames are scored and
    prediction proposals are Hungarian-matched to GT objects by mean
    (J+F)/2 (evaluation.py:44-64). task='semi-supervised' instead drops
    the first/last frames and matches objects by identity (:28-42,
    84-85)."""
    from scipy.optimize import linear_sum_assignment

    j_stats: List = []
    f_stats: List = []
    per_sequence: Dict[str, Dict[str, float]] = {}
    for seq, v in results.items():
        gt_ids, pred_ids = v["gt"], v["pred"]
        if task == "semi-supervised":
            sl = slice(1, -1) if gt_ids.shape[0] > 2 else slice(None)
            gt_ids, pred_ids = gt_ids[sl], pred_ids[sl]
        gt_objs = sorted(set(np.unique(gt_ids)) - {0})
        if task == "unsupervised":
            props = sorted(set(np.unique(pred_ids)) - {0})
            props = props[:max_n_proposals]
            if not props:
                props = [255]  # no proposal: score an empty mask
            n_p, n_g = len(props), len(gt_objs)
            jm = np.zeros((n_p, n_g, gt_ids.shape[0]))
            fm = np.zeros((n_p, n_g, gt_ids.shape[0]))
            for gi, goid in enumerate(gt_objs):
                for pi, poid in enumerate(props):
                    jm[pi, gi] = db_eval_iou(
                        gt_ids == goid, pred_ids == poid
                    )
                    fm[pi, gi] = db_eval_boundary(
                        gt_ids == goid, pred_ids == poid
                    )
            score = (jm.mean(axis=2) + fm.mean(axis=2)) / 2
            row, col = linear_sum_assignment(-score)
            # rows beyond the number of proposals score as empty masks
            j_per_obj = {c: jm[r, c] for r, c in zip(row, col)}
            f_per_obj = {c: fm[r, c] for r, c in zip(row, col)}
            for gi, goid in enumerate(gt_objs):
                jf = j_per_obj.get(
                    gi, db_eval_iou(gt_ids == goid,
                                    np.zeros_like(pred_ids, bool))
                )
                ff = f_per_obj.get(
                    gi, db_eval_boundary(gt_ids == goid,
                                         np.zeros_like(pred_ids, bool))
                )
                jst = db_statistics(np.atleast_1d(jf))
                fst = db_statistics(np.atleast_1d(ff))
                j_stats.append(jst)
                f_stats.append(fst)
                per_sequence[f"{seq}_{goid}"] = {
                    "J-Mean": jst[0], "F-Mean": fst[0],
                }
            continue
        for oid in gt_objs:
            jf = db_eval_iou(gt_ids == oid, pred_ids == oid)
            ff = db_eval_boundary(gt_ids == oid, pred_ids == oid)
            jst = db_statistics(np.atleast_1d(jf))
            fst = db_statistics(np.atleast_1d(ff))
            j_stats.append(jst)
            f_stats.append(fst)
            per_sequence[f"{seq}_{oid}"] = {
                "J-Mean": jst[0], "F-Mean": fst[0],
            }
    if not j_stats:
        return {"global": {}, "per_sequence": {}}
    j = np.asarray(j_stats)
    f = np.asarray(f_stats)
    glob = {
        "J&F-Mean": float((j[:, 0].mean() + f[:, 0].mean()) / 2),
        "J-Mean": float(j[:, 0].mean()),
        "J-Recall": float(j[:, 1].mean()),
        "J-Decay": float(j[:, 2].mean()),
        "F-Mean": float(f[:, 0].mean()),
        "F-Recall": float(f[:, 1].mean()),
        "F-Decay": float(f[:, 2].mean()),
    }
    return {"global": glob, "per_sequence": per_sequence}


def average_annotators(
    annotator_globals: Sequence[Dict[str, float]],
) -> Dict[str, float]:
    """Ref-DAVIS convention: the official evaluator runs once per
    annotator result tree (4 annotators, ref post_process_davis.py:54)
    and the reported number is the mean of the global tables."""
    if not annotator_globals:
        return {}
    keys = annotator_globals[0].keys()
    return {
        k: float(np.mean([g[k] for g in annotator_globals])) for k in keys
    }


def postprocess_davis(
    src_dir: str, ann_file: str, dst_dir: str, num_annotators: int = 4
) -> List[str]:
    """Per-expression mask PNGs -> per-annotator palette trees (ref
    post_process_davis.py:30-99). Ref-DAVIS pairs each object with 4
    annotator expressions, interleaved as exp index = obj_id * 4 +
    anno_id; per annotator the objects are merged by the thresholded
    argmax-with-background rule and written as palette PNGs named
    {frame:05d}.png under <dst>/anno_<k>/<video>/."""
    from PIL import Image

    with open(ann_file) as f:
        videos = json.load(f)["videos"]
    out_dirs = [
        os.path.join(dst_dir, f"anno_{k}") for k in range(num_annotators)
    ]
    for video, vd in videos.items():
        exp_ids = list(vd["expressions"].keys())
        num_obj = len(exp_ids) // num_annotators
        for anno_id in range(num_annotators):
            objs = []
            for obj_id in range(num_obj):
                exp_id = exp_ids[obj_id * num_annotators + anno_id]
                mdir = os.path.join(src_dir, video, exp_id)
                files = sorted(os.listdir(mdir))
                objs.append(np.stack([
                    np.asarray(
                        Image.open(os.path.join(mdir, f)).convert("L"),
                        dtype=np.float32,
                    ) / 255.0
                    for f in files
                ]))
            if not objs:
                continue
            id_maps = merge_objects_to_palette(objs)
            adir = os.path.join(out_dirs[anno_id], video)
            os.makedirs(adir, exist_ok=True)
            save_palette_pngs(
                id_maps, [f"{i:05d}" for i in range(len(id_maps))], adir
            )
    return out_dirs


def _load_palette_stack(d: str) -> np.ndarray:
    from PIL import Image

    files = sorted(f for f in os.listdir(d) if f.endswith(".png"))
    return np.stack([
        np.asarray(Image.open(os.path.join(d, f)), dtype=np.uint8)
        for f in files
    ])


def eval_davis_annotators(
    dst_dir: str, gt_dir: str, num_annotators: int = 4,
    task: str = "unsupervised",
) -> Dict[str, object]:
    """Run the official evaluation per annotator tree against the DAVIS
    palette GT (<gt_dir>/<video>/*.png) and average the global tables
    (ref eval_davis.py run per anno_k + mean; Ref-DAVIS uses the
    default unsupervised task)."""
    per_annotator = []
    for k in range(num_annotators):
        adir = os.path.join(dst_dir, f"anno_{k}")
        if not os.path.isdir(adir):
            continue
        results = {}
        for video in sorted(os.listdir(adir)):
            gdir = os.path.join(gt_dir, video)
            if not os.path.isdir(gdir):
                continue
            pred = _load_palette_stack(os.path.join(adir, video))
            gt = _load_palette_stack(gdir)[: len(pred)]
            results[video] = {"gt": gt, "pred": pred}
        per_annotator.append(
            evaluate_davis_official(results, task=task)["global"]
        )
    return {
        "per_annotator": per_annotator,
        "mean": average_annotators(per_annotator),
    }
