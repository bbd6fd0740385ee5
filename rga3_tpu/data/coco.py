"""Minimal COCO annotation index (pycocotools is not available offline).

Covers what the data layer needs from `pycocotools.coco.COCO`
(ref: utils/sem_seg_dataset.py:87-124 — loadCats/getCatIds/getImgIds/
loadImgs/getAnnIds/loadAnns/annToMask for PACO-LVIS and Pascal-Part):
json parsing into id-indexed maps plus segmentation rasterization via the
pure-numpy RLE codec (utils/rle.py) and cv2 polygon fill.
"""
from __future__ import annotations

import json
from collections import defaultdict
from typing import Any, Dict, List, Sequence, Union

import numpy as np

from ..utils import rle as rle_codec


class CocoIndex:
    def __init__(self, annotation_file: str):
        with open(annotation_file) as f:
            data = json.load(f)
        self.cats: Dict[int, Dict] = {
            c["id"]: c for c in data.get("categories", [])
        }
        self.imgs: Dict[int, Dict] = {i["id"]: i for i in data.get("images", [])}
        self.anns: Dict[int, Dict] = {
            a["id"]: a for a in data.get("annotations", [])
        }
        self.img_to_anns: Dict[int, List[int]] = defaultdict(list)
        for a in data.get("annotations", []):
            self.img_to_anns[a["image_id"]].append(a["id"])

    # -- pycocotools-compatible surface --------------------------------
    def getCatIds(self) -> List[int]:
        return sorted(self.cats.keys())

    def loadCats(self, ids: Sequence[int]) -> List[Dict]:
        return [self.cats[i] for i in ids]

    def getImgIds(self) -> List[int]:
        return sorted(self.imgs.keys())

    def loadImgs(self, ids: Sequence[int]) -> List[Dict]:
        return [self.imgs[i] for i in ids]

    def getAnnIds(self, imgIds: Union[int, Sequence[int]]) -> List[int]:
        if isinstance(imgIds, int):
            imgIds = [imgIds]
        out: List[int] = []
        for i in imgIds:
            out.extend(self.img_to_anns.get(i, []))
        return out

    def loadAnns(self, ids: Sequence[int]) -> List[Dict]:
        return [self.anns[i] for i in ids]

    def annToMask(self, ann: Dict[str, Any]) -> np.ndarray:
        img = self.imgs[ann["image_id"]]
        return segmentation_to_mask(
            ann["segmentation"], img["height"], img["width"]
        )


def segmentation_to_mask(
    seg: Any, height: int, width: int
) -> np.ndarray:
    """COCO segmentation (polygon list | uncompressed RLE | compressed
    RLE) -> (H, W) uint8 mask."""
    if isinstance(seg, dict):
        # utils/rle.py decode handles both compressed-string and
        # uncompressed-list counts
        return rle_codec.decode(seg).astype(np.uint8)
    import cv2

    mask = np.zeros((height, width), np.uint8)
    for poly in seg:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [pts.astype(np.int32)], 1)
    return mask
