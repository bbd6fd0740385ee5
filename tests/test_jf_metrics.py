"""J&F metrics + DAVIS palette merge (ref evaluation/mevis_val_u/
metrics.py:6-56, evaluation/refdavis/davis2017/)."""
import numpy as np

from rga3_tpu.evaluation.davis_eval import merge_objects_to_palette
from rga3_tpu.evaluation.jf_metrics import (
    db_eval_boundary, db_eval_iou, f_measure, jf_score, seg2bmap,
)


def test_iou_hand_cases():
    gt = np.zeros((1, 10, 10), bool)
    gt[0, :5] = True
    pred = np.zeros_like(gt)
    pred[0, :5] = True
    assert db_eval_iou(gt, pred)[0] == 1.0
    pred2 = np.zeros_like(gt)
    pred2[0, 2:7] = True  # overlap 30, union 70
    assert abs(db_eval_iou(gt, pred2)[0] - 30 / 70) < 1e-9
    # both empty counts as perfect (the DAVIS convention)
    empty = np.zeros_like(gt)
    assert db_eval_iou(empty, empty)[0] == 1.0


def test_boundary_measures():
    gt = np.zeros((1, 32, 32), bool)
    gt[0, 8:24, 8:24] = True
    assert db_eval_boundary(gt, gt.copy())[0] == 1.0
    # a one-pixel shift keeps high (but not perfect-at-zero-tolerance
    # would be; the dilated match keeps it at 1.0 for small shifts)
    shifted = np.roll(gt, 1, axis=1)
    f = db_eval_boundary(gt, shifted)[0]
    assert 0.9 <= f <= 1.0
    # disjoint boundaries score 0
    far = np.zeros_like(gt)
    far[0, 0:2, 0:2] = True
    assert db_eval_boundary(gt, far)[0] < 0.2


def test_seg2bmap_is_boundary_only():
    seg = np.zeros((16, 16), bool)
    seg[4:12, 4:12] = True
    bmap = seg2bmap(seg)
    # official DAVIS convention: the boundary sits on the
    # outside-adjacent pixel (half-pixel shift), 1 px wide
    assert bmap[3, 3] and bmap[11, 11]
    assert not bmap[8, 8]  # interior
    assert not bmap[0, 0]  # far field
    assert bmap.sum() < seg.sum()


def test_jf_score_mean():
    gt = np.zeros((2, 8, 8), bool)
    gt[:, :4] = True
    s = jf_score(gt, gt.copy())
    assert s["J"] == 1.0 and s["F"] == 1.0 and s["J&F"] == 1.0


def test_merge_objects_to_palette():
    masks = np.zeros((2, 3, 5, 5), bool)  # (objects, T, H, W)
    masks[0, :, 0:2] = True
    masks[1, :, 3:5] = True
    idmap = merge_objects_to_palette(masks)
    assert idmap.shape == (3, 5, 5)
    assert (idmap[0, 0] == 1).all()
    assert (idmap[0, 4] == 2).all()
    assert (idmap[0, 2] == 0).all()
    # overlap: later object id wins (DAVIS merge convention: higher id
    # painted over lower)
    masks[1, :, 1] = True
    idmap2 = merge_objects_to_palette(masks)
    assert (idmap2[0, 1] == 2).all()
