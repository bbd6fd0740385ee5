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


def test_binary_dilate_paths_agree():
    """cv2 fast path == vectorized numpy fallback == shifted-OR oracle,
    for the disk selems f_measure actually uses (1080p radius is 18)."""
    from rga3_tpu.evaluation.jf_metrics import (
        _binary_dilate, _binary_dilate_offsets, _disk, _hdilate,
    )

    rng = np.random.default_rng(0)
    for radius, shape in [(1, (24, 31)), (4, (64, 48)), (18, (96, 128))]:
        mask = rng.random(shape) > 0.98
        selem = _disk(radius)
        oracle = _binary_dilate_offsets(mask, selem)
        assert (_binary_dilate(mask, selem) == oracle).all()
        # exercise the numpy fallback even when cv2 is importable
        import rga3_tpu.evaluation.jf_metrics as m

        h = mask.shape[0]
        out = np.zeros_like(mask)
        for dy in range(-radius, radius + 1):
            xs = np.nonzero(selem[dy + radius])[0]
            k = int(xs.max() - radius)
            hd = _hdilate(mask, k)
            if dy >= 0:
                out[dy:] |= hd[: h - dy]
            else:
                out[: h + dy] |= hd[-dy:]
        assert (out == oracle).all()
    # empty mask stays empty; full mask stays full
    z = np.zeros((16, 16), bool)
    assert not _binary_dilate(z, _disk(3)).any()
    assert _binary_dilate(~z, _disk(3)).all()


def test_binary_dilate_numpy_fallback_non_disk():
    """A non-contiguous selem routes to the offsets oracle (correctness
    preserved for arbitrary structuring elements)."""
    from rga3_tpu.evaluation.jf_metrics import (
        _binary_dilate_offsets, _hdilate,
    )
    import rga3_tpu.evaluation.jf_metrics as m

    rng = np.random.default_rng(1)
    mask = rng.random((32, 32)) > 0.9
    selem = np.zeros((5, 5), np.uint8)
    selem[2, 0] = selem[2, 4] = selem[0, 2] = 1  # holes in the middle row
    # bypass cv2 to hit the pure-python routing logic
    import builtins

    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("forced")
        return real_import(name, *a, **k)

    builtins.__import__ = no_cv2
    try:
        got = m._binary_dilate(mask, selem)
    finally:
        builtins.__import__ = real_import
    assert (got == _binary_dilate_offsets(mask, selem)).all()


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
    # overlap: the reference's argmax merge gives ties to the LOWER
    # object id (post_process_davis.py:82-87 — argmax returns the first
    # maximum over [0.1 background, obj1, obj2, ...])
    masks[1, :, 1] = True
    idmap2 = merge_objects_to_palette(masks)
    assert (idmap2[0, 1] == 1).all()


def test_db_statistics_mean_recall_decay():
    from rga3_tpu.evaluation.jf_metrics import db_statistics

    # 8 frames declining from 1.0 to 0.3
    v = np.asarray([1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3])
    m, r, d = db_statistics(v)
    np.testing.assert_allclose(m, v.mean())
    np.testing.assert_allclose(r, np.mean(v > 0.5))  # 5/8
    # official binning: ids = round(linspace(1, 8, 5)) - 1 = [0,2,3,5,7]
    # (np.round(4.5) == 4, banker's rounding); bin0 = v[0:3], bin3 = v[5:8]
    np.testing.assert_allclose(d, v[0:3].mean() - v[5:8].mean())


def test_evaluate_davis_official_tables():
    from rga3_tpu.evaluation.davis_eval import (
        average_annotators, evaluate_davis_official,
    )

    t, h, w = 6, 16, 16
    gt = np.zeros((t, h, w), np.uint8)
    gt[:, 2:10, 2:10] = 1
    pred_perfect = gt.copy()
    out = evaluate_davis_official({"seq": {"gt": gt, "pred": pred_perfect}})
    g = out["global"]
    assert set(g) == {"J&F-Mean", "J-Mean", "J-Recall", "J-Decay",
                      "F-Mean", "F-Recall", "F-Decay"}
    np.testing.assert_allclose(g["J-Mean"], 1.0)
    np.testing.assert_allclose(g["J-Recall"], 1.0)
    np.testing.assert_allclose(g["J-Decay"], 0.0, atol=1e-12)
    assert "seq_1" in out["per_sequence"]

    pred_bad = np.zeros_like(gt)
    out_bad = evaluate_davis_official({"seq": {"gt": gt, "pred": pred_bad}})
    assert out_bad["global"]["J-Mean"] < 0.2

    avg = average_annotators([g, out_bad["global"]])
    np.testing.assert_allclose(
        avg["J-Mean"], (g["J-Mean"] + out_bad["global"]["J-Mean"]) / 2
    )


def test_davis_postprocess_and_annotator_eval(tmp_path):
    """Per-expression PNGs -> 4-annotator palette trees -> official
    global tables averaged over annotators (fixture in the reference's
    file layout: exp index = obj_id*4 + anno_id)."""
    import json

    from PIL import Image

    from rga3_tpu.evaluation.davis_eval import (
        eval_davis_annotators, postprocess_davis,
    )

    t, h, w = 4, 16, 16
    video = "seq0"
    # two objects, disjoint squares
    obj_boxes = [(2, 2, 8, 8), (9, 9, 15, 15)]
    src = tmp_path / "preds"
    exps = {}
    for obj_id in range(2):
        for anno_id in range(4):
            exp_id = str(obj_id * 4 + anno_id)
            exps[exp_id] = {"exp": f"obj{obj_id}"}
            d = src / video / exp_id
            d.mkdir(parents=True)
            y0, x0, y1, x1 = obj_boxes[obj_id]
            m = np.zeros((h, w), np.uint8)
            m[y0:y1, x0:x1] = 255
            for f in range(t):
                Image.fromarray(m).save(d / f"{f:05d}.png")
    ann = tmp_path / "meta_expressions.json"
    ann.write_text(json.dumps({"videos": {video: {
        "expressions": exps, "frames": [f"{i:05d}" for i in range(t)],
    }}}))
    # GT palette annotations identical to the merged prediction
    from rga3_tpu.evaluation.davis_eval import save_palette_pngs

    gt_dir = tmp_path / "Annotations"
    gt = np.zeros((h, w), np.uint8)
    for oid, (y0, x0, y1, x1) in enumerate(obj_boxes, 1):
        gt[y0:y1, x0:x1] = oid
    save_palette_pngs(
        np.stack([gt] * t), [f"{i:05d}" for i in range(t)],
        str(gt_dir / video),
    )

    merged = str(tmp_path / "merged")
    out_dirs = postprocess_davis(str(src), str(ann), merged)
    assert len(out_dirs) == 4
    scores = eval_davis_annotators(merged, str(gt_dir))
    assert len(scores["per_annotator"]) == 4
    np.testing.assert_allclose(scores["mean"]["J&F-Mean"], 1.0)
    np.testing.assert_allclose(scores["mean"]["J-Recall"], 1.0)


def test_davis_unsupervised_hungarian_matching():
    """Ref-DAVIS runs the evaluator's default unsupervised task: proposal
    ids need not match GT ids (Hungarian assignment by mean J&F), and all
    frames are scored."""
    from rga3_tpu.evaluation.davis_eval import evaluate_davis_official

    t, h, w = 4, 16, 16
    gt = np.zeros((t, h, w), np.uint8)
    gt[:, 2:8, 2:8] = 1
    gt[:, 9:15, 9:15] = 2
    pred_swapped = np.zeros_like(gt)
    pred_swapped[gt == 1] = 2   # ids permuted vs GT
    pred_swapped[gt == 2] = 1
    out = evaluate_davis_official({"s": {"gt": gt, "pred": pred_swapped}})
    np.testing.assert_allclose(out["global"]["J-Mean"], 1.0)
    # identity matching (semi-supervised) would score ~0 here
    out_semi = evaluate_davis_official(
        {"s": {"gt": gt, "pred": pred_swapped}}, task="semi-supervised"
    )
    assert out_semi["global"]["J-Mean"] < 0.2
    # fewer proposals than GT objects: unmatched object scores vs empty
    pred_one = np.where(gt == 1, 3, 0).astype(np.uint8)
    out_one = evaluate_davis_official({"s": {"gt": gt, "pred": pred_one}})
    assert 0.3 < out_one["global"]["J-Mean"] < 0.7
