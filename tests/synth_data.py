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


def _learnable_sample(rng, h, w):
    """Dark noisy background + one bright uniform rectangle; GT polygon =
    the rectangle. The target is VISIBLE, so a model that learns must be
    reading the image — val improvement on unseen positions cannot come
    from memorizing masks."""
    img = rng.integers(0, 60, (h, w, 3), dtype=np.uint8)
    bh = int(rng.integers(h // 4, h // 2))
    bw = int(rng.integers(w // 4, w // 2))
    y0 = int(rng.integers(2, h - bh - 2))
    x0 = int(rng.integers(2, w - bw - 2))
    img[y0:y0 + bh, x0:x0 + bw] = (230, 40, 40)
    pts = [[x0, y0], [x0 + bw - 1, y0],
           [x0 + bw - 1, y0 + bh - 1], [x0, y0 + bh - 1]]
    return img, pts


def build_learn_root(root: str, n_train: int = 24, n_val: int = 8,
                     size=(64, 88), seed: int = 0) -> str:
    """ReasonSeg-layout fixture for the learning-proof run: bright-box
    localization with DISJOINT train/val positions. Drives the real
    scripts/train.py entry point (train loop + per-epoch ReasonSeg-val
    gIoU, ref train_joint.py:464-648) to show loss decreasing and val
    gIoU beating the step-0 value."""
    rng = np.random.default_rng(seed)
    h, w = size
    for split, n in (("train", n_train), ("val", n_val)):
        d = os.path.join(root, "reason_seg", "ReasonSeg", split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            img, pts = _learnable_sample(rng, h, w)
            Image.fromarray(img).save(os.path.join(d, f"{split}{i:03d}.jpg"))
            anno = {
                "shapes": [{"label": "target", "points": pts}],
                "text": ["the bright red box"],
                "is_sentence": False,
            }
            with open(os.path.join(d, f"{split}{i:03d}.json"), "w") as f:
                json.dump(anno, f)
    return root
