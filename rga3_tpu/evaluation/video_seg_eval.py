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
    """Flatten meta_expressions.json into per-expression jobs."""
    with open(ann_file) as f:
        videos = json.load(f)["videos"]
    jobs = []
    for vid, vd in videos.items():
        frames = sorted(vd["frames"])
        for exp_id, ed in vd["expressions"].items():
            jobs.append({
                "video": vid,
                "exp_id": exp_id,
                "exp": ed["exp"],
                "anno_id": [str(a) for a in ed.get("anno_id", [])],
                "frames": frames,
            })
    return jobs


def run_inference(
    segmentor,
    data_root: str,
    split: str,
    out_dir: str,
    subset_idx: int = 0,
    subset_num: int = 1,
    max_jobs: Optional[int] = None,
) -> int:
    """Write per-frame PNG masks under out_dir/<video>/<exp_id>/."""
    from PIL import Image

    from ..data.video import load_frames_from_dir

    ann = os.path.join(data_root, split, "meta_expressions.json")
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
            os.path.join(data_root, split, "JPEGImages", video)
        )
        all_masks = segmentor.segment_video_multi(
            frames, [job["exp"] for job in pending]
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
            preds[i] = np.asarray(Image.open(p)) > 127
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

    ann = os.path.join(data_root, split, "meta_expressions.json")
    jobs = load_meta_expressions(ann)
    with open(os.path.join(data_root, split, mask_dict_name)) as f:
        mask_dict = json.load(f)

    work = []
    for job in jobs:
        t = len(job["frames"])
        first = None
        for aid in job["anno_id"]:
            annos = mask_dict.get(aid)
            if annos:
                for a in annos:
                    if a is not None:
                        first = a
                        break
            if first:
                break
        if first is None:
            continue
        h, w = first["size"]
        gt = np.zeros((t, h, w), bool)
        for aid in job["anno_id"]:
            annos = mask_dict.get(aid, [])
            for i, a in enumerate(annos[:t]):
                if a is not None:
                    gt[i] |= rle_codec.decode(a).astype(bool)
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
