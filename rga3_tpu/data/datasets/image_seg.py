"""Image segmentation datasets (pseudo-video): ReasonSeg, RefCOCO-family,
semantic segmentation.

Rebuilds of ref utils/{reason_seg,refer_seg,sem_seg}_dataset.py. Each still
image is repeated into num_frames_sam pseudo-video frames.
"""
from __future__ import annotations

import glob
import json
import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..templates import EXPLANATORY_QUESTION_LIST
from .base import (
    TaskDataset,
    build_pseudo_video_sample,
    make_seg_answer,
    make_seg_question,
)


def get_mask_from_json(json_path: str, height: int, width: int):
    """ReasonSeg polygon JSON -> (mask, comments, is_sentence)
    (ref: utils/data_processing.py:8-59 — value 1 target, 255 ignore,
    polygons painted largest-first)."""
    import cv2

    try:
        with open(json_path, "r") as f:
            anno = json.load(f)
    except Exception:
        with open(json_path, "r", encoding="cp1252") as f:
            anno = json.load(f)
    shapes = anno["shapes"]
    comments = anno["text"]
    is_sentence = anno["is_sentence"]

    valid = []
    areas = []
    for s in shapes:
        if s["label"].lower() == "flag":
            continue
        tmp = np.zeros((height, width), np.uint8)
        pts = np.asarray([s["points"]], np.int32)
        cv2.polylines(tmp, pts, True, 1, 1)
        cv2.fillPoly(tmp, pts, 1)
        areas.append(tmp.sum())
        valid.append(s)
    order = np.argsort(areas)[::-1]
    mask = np.zeros((height, width), np.uint8)
    for idx in order:
        s = valid[idx]
        value = 255 if "ignore" in s["label"].lower() else 1
        pts = np.asarray([s["points"]], np.int32)
        cv2.polylines(mask, pts, True, value, 1)
        cv2.fillPoly(mask, pts, value)
    return mask, comments, is_sentence


class ReasonSegDataset(TaskDataset):
    """ReasonSeg train split: *.jpg + *.json pairs; optional explanatory
    answers with probability `explanatory`
    (ref: utils/reason_seg_dataset.py)."""

    name = "reason_seg"

    def __init__(
        self,
        base_dir: str,
        split: str = "train",
        num_frames_mllm: int = 8,
        num_frames_sam: int = 4,
        explanatory: float = 0.1,
        mask_res: int = 256,
        sam_size: int = 1024,
    ):
        self.images = sorted(
            glob.glob(os.path.join(base_dir, "reason_seg", "ReasonSeg",
                                   split, "*.jpg"))
        )
        self.num_frames_mllm = num_frames_mllm
        self.num_frames_sam = num_frames_sam
        self.explanatory = explanatory
        self.mask_res = mask_res
        self.sam_size = sam_size

    def __len__(self):
        return len(self.images)

    def sample(self):
        from PIL import Image

        path = random.choice(self.images)
        img = np.asarray(Image.open(path).convert("RGB"))
        mask, comments, is_sentence = get_mask_from_json(
            path.replace(".jpg", ".json"), *img.shape[:2]
        )
        text = random.choice(comments) if isinstance(comments, list) else comments
        question = make_seg_question(text, long=is_sentence)
        if random.random() < self.explanatory:
            question = (
                question + " " + random.choice(EXPLANATORY_QUESTION_LIST)
            )
        return build_pseudo_video_sample(
            os.path.basename(path), img, (mask == 1).astype(np.float32),
            question, make_seg_answer(),
            self.num_frames_mllm, self.num_frames_sam,
            sam_size=self.sam_size, mask_res=self.mask_res,
        )


class ReferSegDataset(TaskDataset):
    """RefCOCO-family referring segmentation via the REFER index
    (ref: utils/refer_seg_dataset.py + utils/refer.py)."""

    name = "refer_seg"

    def __init__(
        self,
        base_dir: str,
        datasets: str = "refcoco||refcoco+||refcocog",
        num_frames_mllm: int = 8,
        num_frames_sam: int = 4,
        mask_res: int = 256,
        sam_size: int = 1024,
    ):
        from ..refer import REFER

        self.refs = []
        for ds in datasets.split("||"):
            split_by = "umd" if ds == "refcocog" else "unc"
            if ds == "refclef":
                split_by = "unc"
            try:
                api = REFER(
                    os.path.join(base_dir, "refer_seg"), ds, split_by
                )
                ref_ids = api.getRefIds(split="train")
                self.refs.append((ds, api, ref_ids))
            except FileNotFoundError:
                continue
        self.num_frames_mllm = num_frames_mllm
        self.num_frames_sam = num_frames_sam
        self.mask_res = mask_res
        self.sam_size = sam_size

    def __len__(self):
        return sum(len(r[2]) for r in self.refs)

    def sample(self):
        from PIL import Image

        ds, api, ref_ids = random.choice(self.refs)
        ref = api.loadRefs(random.choice(ref_ids))[0]
        img_info = api.Imgs[ref["image_id"]]
        img_dir = (
            "images/saiapr_tc-12" if ds == "refclef"
            else "images/mscoco/images/train2014"
        )
        path = os.path.join(api.data_root, img_dir, img_info["file_name"])
        img = np.asarray(Image.open(path).convert("RGB"))
        mask = api.get_mask(ref)
        sent = random.choice(ref["sentences"])["sent"]
        return build_pseudo_video_sample(
            f"{ds}_{ref['ref_id']}", img, mask.astype(np.float32),
            make_seg_question(sent), make_seg_answer(),
            self.num_frames_mllm, self.num_frames_sam,
            sam_size=self.sam_size, mask_res=self.mask_res,
        )


class SemSegDataset(TaskDataset):
    """Semantic-segmentation-as-referring (ADE20K/COCO-Stuff layout:
    images dir + per-pixel label PNGs + classes json)
    (ref: utils/sem_seg_dataset.py)."""

    name = "sem_seg"

    def __init__(
        self,
        base_dir: str,
        num_frames_mllm: int = 8,
        num_frames_sam: int = 4,
        mask_res: int = 256,
        sam_size: int = 1024,
    ):
        self.base = os.path.join(base_dir, "ade20k")
        classes_file = os.path.join(self.base, "ade20k_classes.json")
        self.classes: List[str] = []
        self.images: List[str] = []
        if os.path.exists(classes_file):
            with open(classes_file) as f:
                self.classes = json.load(f)
            self.images = sorted(
                glob.glob(
                    os.path.join(self.base, "images", "training", "*.jpg")
                )
            )
        self.num_frames_mllm = num_frames_mllm
        self.num_frames_sam = num_frames_sam
        self.mask_res = mask_res
        self.sam_size = sam_size

    def __len__(self):
        return len(self.images)

    def sample(self):
        from PIL import Image

        for _ in range(10):
            path = random.choice(self.images)
            label_path = path.replace("images", "annotations").replace(
                ".jpg", ".png"
            )
            img = np.asarray(Image.open(path).convert("RGB"))
            label = np.asarray(Image.open(label_path))
            ids = np.unique(label)
            ids = ids[(ids != 0) & (ids != 255)]
            if len(ids):
                break
        cls_id = int(random.choice(ids))
        mask = (label == cls_id).astype(np.float32)
        name = self.classes[cls_id - 1] if cls_id - 1 < len(self.classes) else str(cls_id)
        return build_pseudo_video_sample(
            os.path.basename(path), img, mask,
            make_seg_question(name), make_seg_answer(),
            self.num_frames_mllm, self.num_frames_sam,
            sam_size=self.sam_size, mask_res=self.mask_res,
        )
