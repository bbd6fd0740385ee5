"""Image-seg validation drivers with synthetic fixtures + stub segmentor."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from rga3_tpu.evaluation.image_seg_eval import (
    evaluate_image_masks, run_all_image_seg_vals, run_reason_seg_val,
)
from rga3_tpu.evaluation.davis_eval import (
    evaluate_davis, merge_objects_to_palette, save_palette_pngs,
)


class EchoSegmentor:
    """Returns a fixed box mask."""

    def segment_video(self, frames, expression):
        h, w = frames[0].shape[:2]
        m = np.zeros((1, h, w), bool)
        m[0, 10:30, 10:40] = True
        return m


@pytest.fixture()
def reason_root(tmp_path):
    d = tmp_path / "reason_seg" / "ReasonSeg" / "val"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    ).save(d / "x.jpg")
    anno = {
        "shapes": [{"label": "t", "points": [[10, 10], [40, 10], [40, 30],
                                             [10, 30]]}],
        "text": ["the box"],
        "is_sentence": False,
    }
    with open(d / "x.json", "w") as f:
        json.dump(anno, f)
    return str(tmp_path)


def test_evaluate_image_masks_perfect():
    gt = np.zeros((32, 32), np.uint8)
    gt[4:20, 4:20] = 1
    out = evaluate_image_masks([gt.astype(bool)], [gt])
    assert out["gIoU"] == 1.0 and out["cIoU"] == 1.0


def test_reason_seg_val_runs(reason_root):
    out = run_reason_seg_val(EchoSegmentor(), reason_root)
    assert out["n"] == 1
    assert 0.0 < out["gIoU"] <= 1.0


def test_run_all_skips_missing(reason_root):
    out = run_all_image_seg_vals(EchoSegmentor(), reason_root)
    assert "ReasonSeg|val" in out
    assert all(not k.startswith("refcoco") or "error" not in out[k]
               for k in out)


def test_davis_pipeline(tmp_path):
    t, h, w = 4, 32, 32
    obj1 = np.zeros((t, h, w), bool)
    obj1[:, 4:12, 4:12] = True
    obj2 = np.zeros((t, h, w), bool)
    obj2[:, 20:28, 20:28] = True
    ids = merge_objects_to_palette([obj1, obj2])
    assert set(np.unique(ids)) == {0, 1, 2}
    save_palette_pngs(ids, [f"{i:05d}" for i in range(t)], str(tmp_path))
    assert len(os.listdir(tmp_path)) == t
    scores = evaluate_davis({"seq": {"gt": ids, "pred": ids}})
    assert scores["J&F"] == 1.0
    shifted = np.roll(ids, 3, axis=2)
    worse = evaluate_davis({"seq": {"gt": ids, "pred": shifted}})
    assert worse["J&F"] < 1.0
