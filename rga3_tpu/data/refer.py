"""REFER annotation API (RefCOCO / RefCOCO+ / RefCOCOg / RefCLEF).

Compact rebuild of ref utils/refer.py (391 LoC): loads `refs(<splitBy>).p`
+ `instances.json`, builds the cross-indexes, and rasterizes masks from
polygon or RLE segmentations using the in-repo RLE codec instead of
pycocotools.
"""
from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any, Dict, List, Sequence, Union

import numpy as np



class REFER:
    def __init__(self, data_root: str, dataset: str = "refcoco",
                 split_by: str = "unc"):
        self.data_root = data_root
        self.dataset = dataset
        ref_file = os.path.join(
            data_root, dataset, f"refs({split_by}).p"
        )
        inst_file = os.path.join(data_root, dataset, "instances.json")
        if not os.path.exists(ref_file):
            raise FileNotFoundError(ref_file)
        with open(ref_file, "rb") as f:
            self.refs_data: List[Dict] = pickle.load(f)
        with open(inst_file) as f:
            instances = json.load(f)

        self.Imgs = {im["id"]: im for im in instances["images"]}
        self.Anns = {a["id"]: a for a in instances["annotations"]}
        self.Cats = {c["id"]: c["name"] for c in instances["categories"]}
        self.Refs = {r["ref_id"]: r for r in self.refs_data}
        self.imgToRefs: Dict[int, List] = {}
        for r in self.refs_data:
            self.imgToRefs.setdefault(r["image_id"], []).append(r)

    # -- lookups ---------------------------------------------------------
    def getRefIds(self, image_ids=None, split: str = "") -> List[int]:
        refs = self.refs_data
        if image_ids:
            image_ids = set(
                image_ids if isinstance(image_ids, (list, tuple))
                else [image_ids]
            )
            refs = [r for r in refs if r["image_id"] in image_ids]
        if split:
            refs = [r for r in refs if r["split"] == split]
        return [r["ref_id"] for r in refs]

    def loadRefs(self, ref_ids: Union[int, Sequence[int]]) -> List[Dict]:
        if isinstance(ref_ids, int):
            ref_ids = [ref_ids]
        return [self.Refs[i] for i in ref_ids]

    def loadAnns(self, ann_ids: Union[int, Sequence[int]]) -> List[Dict]:
        if isinstance(ann_ids, int):
            ann_ids = [ann_ids]
        return [self.Anns[i] for i in ann_ids]

    # -- masks ------------------------------------------------------------
    def get_mask(self, ref: Dict) -> np.ndarray:
        """Binary (H, W) mask for a ref's annotation (polygon or RLE)."""
        from .coco import segmentation_to_mask

        ann = self.Anns[ref["ann_id"]]
        img = self.Imgs[ref["image_id"]]
        return segmentation_to_mask(
            ann["segmentation"], img["height"], img["width"]
        )
