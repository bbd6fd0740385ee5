"""Referring-VOS benchmark drivers: MeViS / ReVOS / ReasonVOS / Ref-DAVIS.

Rebuild of the reference's shard-and-merge eval convention
(ref: evaluation/mevis_val_u/inference_mevis.py — `--subset_idx/subset_num`
striding at :133, per-frame PNG masks, idempotent skip of existing outputs
at :158-159; eval_mevis.py — multiprocessing J&F over expressions).

The job-shard pattern maps directly onto independent TPU hosts.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .jf_metrics import db_eval_boundary, db_eval_iou


def load_meta_expressions(ann_file: str) -> List[Dict]:
    """Flatten meta_expressions.json into per-expression jobs. Carries the
    optional ReVOS `type_id` (0 referring / 1 reason / 2 nan) and ReasonVOS
    `is_sent` fields when present.

    Two published layouts (both handled):
      * dict expressions — MeViS/ReVOS/Ref-YTVOS: {exp_id: {"exp",
        "anno_id", ...}};
      * list expressions — ReasonVOS (ref inference_reason_vos.py:129-140):
        [{"obj_id", "exp_id", "exp_text", "is_sent"}] plus a per-video
        "source"; outputs are written under "{source}_{vid}_{obj_id}"
        while frames stay under the raw video name ("frames_dir").
    """
    with open(ann_file) as f:
        videos = json.load(f)["videos"]
    jobs = []
    for vid, vd in videos.items():
        frames = sorted(vd.get("frames", []))
        exps = vd["expressions"]
        if isinstance(exps, list):  # ReasonVOS layout
            src = vd.get("source")
            for sample in exps:
                obj_id = sample.get("obj_id", 0)
                save = (
                    f"{src}_{vid}_{obj_id}" if src is not None else vid
                )
                jobs.append({
                    "video": save,
                    "frames_dir": vid,
                    "exp_id": str(sample["exp_id"]),
                    "exp": sample["exp_text"],
                    "anno_id": [str(obj_id)],
                    "frames": frames,
                    "type_id": None,
                    "is_sent": bool(sample.get("is_sent", False)),
                })
            continue
        for exp_id, ed in exps.items():
            jobs.append({
                "video": vid,
                "frames_dir": vid,
                "exp_id": exp_id,
                "exp": ed["exp"],
                "anno_id": [str(a) for a in ed.get("anno_id", [])],
                "frames": frames,
                "type_id": ed.get("type_id"),
                "is_sent": bool(ed.get("is_sent", False)),
            })
    return jobs


def resolve_layout(
    data_root: str, split: str, benchmark: str
) -> Tuple[str, str]:
    """(meta_expressions.json path, JPEGImages dir) for a benchmark root.

    MeViS keeps both under <root>/<split>/; the Ref-YTVOS release nests
    expressions under <root>/meta_expressions/<split>/ (ref:
    evaluation/refytvos/inference_refytvos.py:120-122); the ReVOS release
    puts `meta_expressions_<split>_.json` and `JPEGImages/` directly at
    the root (ref: evaluation/revos/inference_revos.py:123-126), as does
    ReasonVOS with a plain `meta_expressions.json` (ref:
    inference_reason_vos.py:123-125). Falls back across layouts so any
    of them works for any benchmark name.
    """
    candidates = [
        (os.path.join(data_root, split, "meta_expressions.json"),
         os.path.join(data_root, split, "JPEGImages")),
        (os.path.join(data_root, "meta_expressions", split,
                      "meta_expressions.json"),
         os.path.join(data_root, split, "JPEGImages")),
        (os.path.join(data_root, f"meta_expressions_{split}_.json"),
         os.path.join(data_root, "JPEGImages")),
        (os.path.join(data_root, "meta_expressions.json"),
         os.path.join(data_root, "JPEGImages")),
    ]
    if benchmark == "ytvos":
        candidates[0], candidates[1] = candidates[1], candidates[0]
    elif benchmark in ("revos", "reasonvos"):
        candidates = candidates[2:] + candidates[:2]
    for ann, frames in candidates:
        if os.path.exists(ann):
            return ann, frames
    return candidates[0]


def run_inference(
    segmentor,
    data_root: str,
    split: str,
    out_dir: str,
    subset_idx: int = 0,
    subset_num: int = 1,
    max_jobs: Optional[int] = None,
    benchmark: str = "mevis",
) -> int:
    """Write per-frame PNG masks under out_dir/<video>/<exp_id>/.

    `benchmark` selects the reference driver's exact prompt template and
    annotation layout; for `ytvos` the written tree IS the server
    submission layout (per-video/per-expression PNGs named by frame,
    ref: evaluation/refytvos/inference_refytvos.py:140-156, 246-255).
    """
    from PIL import Image

    from ..data.video import load_frames_from_dir
    from .segmentor import eval_seg_question

    ann, frames_root = resolve_layout(data_root, split, benchmark)
    jobs = load_meta_expressions(ann)
    done = 0

    # group the sharded job list by video so every expression of a video
    # shares ONE backbone encode per frame (segment_video_multi); the
    # reference re-runs the full backbone per expression
    by_video = {}
    for i, job in enumerate(jobs):
        if i % subset_num != subset_idx:
            continue
        by_video.setdefault(job["video"], []).append(job)

    for video, vjobs in by_video.items():
        if max_jobs is not None and done >= max_jobs:
            break
        pending = []
        for job in vjobs:
            dst = os.path.join(out_dir, job["video"], job["exp_id"])
            if (os.path.isdir(dst)
                    and len(os.listdir(dst)) == len(job["frames"])):
                continue  # idempotent resume (ref :158-159)
            pending.append(job)
        if max_jobs is not None:
            pending = pending[: max_jobs - done]
        if not pending:
            continue
        frames = load_frames_from_dir(
            os.path.join(frames_root, vjobs[0].get("frames_dir", video))
        )
        all_masks = segmentor.segment_video_multi(
            frames,
            [job["exp"] for job in pending],
            questions=[
                eval_seg_question(
                    job["exp"], benchmark, is_sent=job["is_sent"]
                )
                for job in pending
            ],
        )
        for job, masks in zip(pending, all_masks):
            dst = os.path.join(out_dir, job["video"], job["exp_id"])
            os.makedirs(dst, exist_ok=True)
            for name, m in zip(job["frames"], masks):
                Image.fromarray((m * 255).astype(np.uint8)).save(
                    os.path.join(dst, f"{name}.png")
                )
            done += 1
    return done


def _eval_one(args) -> Tuple[str, str, float, float]:
    job, mask_root, gt_masks = args
    t = len(job["frames"])
    h, w = gt_masks.shape[-2:]
    preds = np.zeros((t, h, w), bool)
    from PIL import Image

    for i, name in enumerate(job["frames"]):
        p = os.path.join(
            mask_root, job["video"], job["exp_id"], f"{name}.png"
        )
        if os.path.exists(p):
            # any nonzero value is foreground: reference drivers write
            # 0/255 (ytvos) or 0/100 (revos) PNGs
            preds[i] = np.asarray(Image.open(p)) > 0
    j = float(np.mean(db_eval_iou(gt_masks, preds)))
    f = float(np.mean(db_eval_boundary(gt_masks, preds)))
    return job["video"], job["exp_id"], j, f


def run_eval(
    data_root: str,
    split: str,
    mask_root: str,
    mask_dict_name: str = "mask_dict.json",
    num_workers: int = 8,
) -> Dict[str, float]:
    """Compute J&F over all expressions (ref eval_mevis.py)."""
    from ..utils import rle as rle_codec

    ann, _ = resolve_layout(data_root, split, "mevis")
    jobs = load_meta_expressions(ann)
    with open(os.path.join(data_root, split, mask_dict_name)) as f:
        mask_dict = json.load(f)

    work = []
    for job in jobs:
        gt = _load_gt_stack(job, mask_dict, rle_codec)
        if gt is None:
            continue
        work.append((job, mask_root, gt))

    if num_workers > 1 and len(work) > 1:
        with mp.Pool(num_workers) as pool:
            results = pool.map(_eval_one, work)
    else:
        results = [_eval_one(w) for w in work]

    js = np.asarray([r[2] for r in results])
    fs = np.asarray([r[3] for r in results])
    return {
        "J": float(js.mean()) if len(js) else 0.0,
        "F": float(fs.mean()) if len(fs) else 0.0,
        "J&F": float((js.mean() + fs.mean()) / 2) if len(js) else 0.0,
        "n": len(results),
    }


def _load_gt_stack(
    job: Dict, mask_dict: Dict, rle_codec
) -> Optional[np.ndarray]:
    """Decode a (T, H, W) bool GT stack for one expression, or None if no
    frame of any anno_id carries a mask."""
    t = len(job["frames"])
    first = None
    for aid in job["anno_id"]:
        for a in mask_dict.get(aid) or []:
            if a is not None:
                first = a
                break
        if first:
            break
    if first is None:
        return None
    h, w = first["size"]
    gt = np.zeros((t, h, w), bool)
    for aid in job["anno_id"]:
        for i, a in enumerate((mask_dict.get(aid) or [])[:t]):
            if a is not None:
                gt[i] |= rle_codec.decode(a).astype(bool)
    return gt


def _eval_one_revos(args) -> Tuple[Dict, float, float, float, float]:
    job, mask_root, gt, fore = args
    from PIL import Image

    from .jf_metrics import (
        db_eval_boundary, db_eval_iou, r2vos_accuracy, r2vos_robustness,
    )

    t, h, w = gt.shape
    preds = np.zeros((t, h, w), bool)
    for i, name in enumerate(job["frames"]):
        p = os.path.join(
            mask_root, job["video"], job["exp_id"], f"{name}.png"
        )
        if os.path.exists(p):
            preds[i] = np.asarray(Image.open(p)) > 0
    j = float(np.mean(db_eval_iou(gt, preds)))
    f = float(np.mean(db_eval_boundary(gt, preds)))
    a = float(np.mean(r2vos_accuracy(gt, preds)))
    r = float(np.mean(r2vos_robustness(gt, preds, fore)))
    return job, j, f, a, r


def run_eval_revos(
    data_root: str,
    split: str,
    mask_root: str,
    mask_dict_name: str = "mask_dict.json",
    foreground_name: str = "mask_dict_foreground.json",
    num_workers: int = 8,
) -> Dict[str, Dict[str, float]]:
    """ReVOS eval: J, F, per-pixel accuracy A and hallucination robustness
    R, split by expression `type_id` (0 referring / 1 reason), with
    `overall` = mean of the two split means
    (ref: evaluation/revos/eval_revos.py:40-183, metrics.py:6-41).

    Matches the reference's aggregation exactly (per-expression scores are
    scaled x100 and rounded to 2 decimals before split averaging). One
    deliberate deviation: predictions and GT are binarized before A/R —
    the reference compares 0/100 PNG values against 0/1 decoded RLE so its
    foreground pixels can never match (eval_revos.py:57 vs
    inference_revos.py:271); the binarized form is what the R²VOS metric
    definition intends.
    """
    from ..utils import rle as rle_codec

    ann, _ = resolve_layout(data_root, split, "revos")
    jobs = load_meta_expressions(ann)
    md_path = os.path.join(data_root, split, mask_dict_name)
    if not os.path.exists(md_path):
        md_path = os.path.join(data_root, mask_dict_name)
    fg_path = os.path.join(data_root, split, foreground_name)
    if not os.path.exists(fg_path):
        fg_path = os.path.join(data_root, foreground_name)
    with open(md_path) as f:
        mask_dict = json.load(f)
    with open(fg_path) as f:
        fg_dict = json.load(f)

    work = []
    for job in jobs:
        gt = _load_gt_stack(job, mask_dict, rle_codec)
        if gt is None:
            continue
        t, h, w = gt.shape
        fore = np.zeros((t, h, w), bool)
        fg_rles = fg_dict.get(job["video"], {}).get("masks_rle", [])
        for i, rle in enumerate(fg_rles[:t]):
            if rle is None:
                continue
            m = rle_codec.decode(rle)
            if m.ndim == 3:  # per-object channel stack (ref :53-54)
                m = m.sum(axis=2)
            fore[i] = m.astype(bool)
        work.append((job, mask_root, gt, fore))

    if num_workers > 1 and len(work) > 1:
        with mp.Pool(num_workers) as pool:
            results = pool.map(_eval_one_revos, work)
    else:
        results = [_eval_one_revos(w) for w in work]

    # per-expression x100 round(2) BEFORE split averaging (ref :131-135)
    rows = [
        {
            "type_id": job["type_id"],
            "J": round(100 * j, 2),
            "F": round(100 * f, 2),
            "A": round(100 * a, 2),
            "R": round(100 * r, 2),
        }
        for job, j, f, a, r in results
    ]

    def split_mean(tid: int) -> Dict[str, float]:
        sel = [d for d in rows if d["type_id"] == tid]
        if not sel:
            return {k: 0.0 for k in ("J", "F", "A", "R", "JF")}
        out = {
            k: float(np.mean([d[k] for d in sel]))
            for k in ("J", "F", "A", "R")
        }
        out["JF"] = (out["J"] + out["F"]) / 2
        return out

    referring = split_mean(0)
    reason = split_mean(1)
    overall = {
        k: (referring[k] + reason[k]) / 2 for k in ("J", "F", "A", "R", "JF")
    }
    return {"referring": referring, "reason": reason, "overall": overall,
            "n": len(rows)}
