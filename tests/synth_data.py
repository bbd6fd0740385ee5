"""Reusable on-disk synthetic data fixtures (MeViS + ReasonSeg layouts) for
driving scripts/train.py end-to-end without real datasets."""
import json
import os

import numpy as np
from PIL import Image

from rga3_tpu.utils import rle


def build_synth_root(root: str, seed: int = 0) -> str:
    """Write a tiny MeViS + ReasonSeg training fixture under `root`."""
    rng = np.random.default_rng(seed)

    mdir = os.path.join(root, "mevis", "train")
    os.makedirs(os.path.join(mdir, "JPEGImages", "vid0"), exist_ok=True)
    frames = [f"{i:05d}" for i in range(4)]
    for f in frames:
        Image.fromarray(
            rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        ).save(os.path.join(mdir, "JPEGImages", "vid0", f"{f}.jpg"))
    mask = np.zeros((60, 80), np.uint8)
    mask[20:40, 30:60] = 1
    with open(os.path.join(mdir, "mask_dict.json"), "w") as f:
        json.dump({"7": [rle.encode(mask) for _ in frames]}, f)
    meta = {"videos": {"vid0": {
        "frames": frames,
        "expressions": {"0": {"exp": "the moving box", "anno_id": ["7"],
                              "obj_id": [1]}},
    }}}
    with open(os.path.join(mdir, "meta_expressions.json"), "w") as f:
        json.dump(meta, f)

    rdir = os.path.join(root, "reason_seg", "ReasonSeg", "train")
    os.makedirs(rdir, exist_ok=True)
    for name in ("a", "b"):
        img = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(rdir, f"{name}.jpg"))
        anno = {
            "shapes": [{"label": "target",
                        "points": [[10, 10], [40, 10], [40, 30], [10, 30]]}],
            "text": [f"the thing you would sit on ({name})"],
            "is_sentence": True,
        }
        with open(os.path.join(rdir, f"{name}.json"), "w") as f:
            json.dump(anno, f)
    return root
