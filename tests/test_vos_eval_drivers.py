"""Ref-YTVOS submission driver + ReVOS accuracy/robustness eval tests.

Hand-case checks of the R²VOS metrics (ref: evaluation/revos/metrics.py:6-41)
and synthetic-fixture end-to-end runs of `run_eval_revos` and the ytvos
submission `run_inference` layout (ref: evaluation/refytvos/
inference_refytvos.py:140-156, evaluation/revos/eval_revos.py:40-183).
"""
import json
import os

import numpy as np
import pytest

from rga3_tpu.evaluation.jf_metrics import (
    db_eval_boundary, db_eval_iou, r2vos_accuracy, r2vos_robustness,
)
from rga3_tpu.evaluation.segmentor import eval_seg_question
from rga3_tpu.evaluation.video_seg_eval import (
    resolve_layout, run_eval_revos, run_inference,
)
from rga3_tpu.utils import rle as rle_codec


# ---------------------------------------------------------------- metrics
def test_r2vos_accuracy_hand_case():
    gt = np.zeros((2, 4, 4), np.uint8)
    gt[0, :2, :2] = 1  # 4 fg pixels
    pred = np.zeros((2, 4, 4), np.uint8)
    pred[0, :2, :] = 1  # 4 hits + 4 false positives
    acc = r2vos_accuracy(gt, pred)
    assert acc.shape == (2,)
    assert acc[0] == pytest.approx(12 / 16)
    assert acc[1] == pytest.approx(1.0)


def test_r2vos_robustness_hand_case():
    gt = np.zeros((1, 4, 4), np.uint8)
    gt[0, :2, :2] = 1
    pred = np.zeros((1, 4, 4), np.uint8)
    pred[0, :2, :] = 1  # 4 pixels outside GT
    fore = np.zeros((1, 4, 4), np.uint8)
    fore[0, :2, :] = 1  # foreground area 8
    r = r2vos_robustness(gt, pred, fore)
    assert r[0] == pytest.approx(1 - 4 / (8 + 1e-6))


def test_r2vos_robustness_clamps_to_zero():
    gt = np.zeros((1, 2, 2), np.uint8)
    pred = np.ones((1, 2, 2), np.uint8)  # 4 FPs
    fore = np.zeros((1, 2, 2), np.uint8)
    fore[0, 0, 0] = 1  # area 1 -> 1 - 4/1 < 0
    assert r2vos_robustness(gt, pred, fore)[0] == 0.0


# ----------------------------------------------------------- templates
def test_eval_seg_question_templates():
    assert (
        eval_seg_question("The Red Car", "mevis")
        == "Please segment the the red car in this image."
    )
    assert eval_seg_question("dog", "ytvos") == (
        "Please segment the dog in this image."
    )
    # revos: question-form keeps phrasing (ref inference_revos.py:173-175)
    assert eval_seg_question("which one jumps?", "revos") == (
        "which one jumps? Please output the segmentation mask."
    )
    # revos: lowercase-initial trailing '.' stripped (ref :177-180)
    assert eval_seg_question("a cat.", "revos") == (
        "Please segment the a cat in this image."
    )
    # capitalized trailing '.' kept (reference quirk)
    assert eval_seg_question("A cat.", "revos") == (
        "Please segment the a cat. in this image."
    )
    # reasonvos: is_sent adds a period (ref inference_reason_vos.py:169-171)
    assert eval_seg_question("it is fast", "reasonvos", is_sent=True) == (
        "it is fast. Please output the segmentation mask."
    )
    assert eval_seg_question("fast car", "reasonvos") == (
        "Please segment the fast car in this image."
    )


# ------------------------------------------------------ revos end-to-end
def _write_png(path, mask):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((mask.astype(np.uint8)) * 255).save(path)


@pytest.fixture()
def revos_fixture(tmp_path):
    """2 expressions (type_id 0 and 1) over one 2-frame 8x8 video."""
    root = tmp_path / "revos"
    split = "valid"
    d = root / split
    d.mkdir(parents=True)

    h = w = 8
    gt0 = np.zeros((2, h, w), np.uint8)
    gt0[:, 2:4, 2:4] = 1
    gt1 = np.zeros((2, h, w), np.uint8)
    gt1[:, 5:7, 5:7] = 1
    fore = (gt0 | gt1).astype(np.uint8)

    meta = {"videos": {"vidA": {
        "frames": ["00000", "00001"],
        "expressions": {
            "0": {"exp": "left box", "anno_id": [1], "type_id": 0},
            "1": {"exp": "why right?", "anno_id": [2], "type_id": 1},
        },
    }}}
    (d / "meta_expressions.json").write_text(json.dumps(meta))
    (d / "mask_dict.json").write_text(json.dumps({
        "1": [rle_codec.encode(gt0[i]) for i in range(2)],
        "2": [rle_codec.encode(gt1[i]) for i in range(2)],
    }))
    (d / "mask_dict_foreground.json").write_text(json.dumps({
        "vidA": {"masks_rle": [rle_codec.encode(fore[i]) for i in range(2)]},
    }))

    out = tmp_path / "preds"
    # exp 0: perfect. exp 1: frame0 perfect, frame1 all-empty.
    for i, name in enumerate(["00000", "00001"]):
        _write_png(str(out / "vidA" / "0" / f"{name}.png"), gt0[i])
    _write_png(str(out / "vidA" / "1" / "00000.png"), gt1[0])
    _write_png(str(out / "vidA" / "1" / "00001.png"), np.zeros((h, w)))
    return str(root), split, str(out), gt1, fore


def test_run_eval_revos_splits(revos_fixture):
    root, split, out, gt1, fore = revos_fixture
    scores = run_eval_revos(root, split, out, num_workers=1)
    assert scores["n"] == 2
    ref = scores["referring"]
    assert ref["J"] == pytest.approx(100.0)
    assert ref["F"] == pytest.approx(100.0)
    assert ref["A"] == pytest.approx(100.0)
    assert ref["R"] == pytest.approx(100.0)
    assert ref["JF"] == pytest.approx(100.0)

    # reason split: frame0 perfect, frame1 empty pred vs 4-px GT
    j1 = (1.0 + 0.0) / 2
    f1 = (1.0 + 0.0) / 2
    a1 = (1.0 + (64 - 4) / 64) / 2
    r1 = 1.0  # no false positives in either frame
    rea = scores["reason"]
    assert rea["J"] == pytest.approx(round(100 * j1, 2))
    assert rea["F"] == pytest.approx(round(100 * f1, 2))
    assert rea["A"] == pytest.approx(round(100 * a1, 2))
    assert rea["R"] == pytest.approx(round(100 * r1, 2))

    ov = scores["overall"]
    for k in ("J", "F", "A", "R", "JF"):
        assert ov[k] == pytest.approx((ref[k] + rea[k]) / 2)


# ------------------------------------------------- ytvos submission tree
class _FakeSegmentor:
    """Records questions; returns a fixed diagonal mask per expression."""

    def __init__(self):
        self.questions = []

    def segment_video_multi(self, frames, expressions, questions=None):
        self.questions.extend(questions or [None] * len(expressions))
        t = len(frames)
        h, w = frames[0].shape[:2]
        out = np.zeros((len(expressions), t, h, w), bool)
        for e in range(len(expressions)):
            out[e, :, e % h, :] = True
        return out


@pytest.fixture()
def ytvos_fixture(tmp_path):
    """Ref-YTVOS release layout: meta_expressions/<split>/ +
    <split>/JPEGImages/<video>/<frame>.jpg."""
    from PIL import Image

    root = tmp_path / "ytvos"
    split = "valid"
    md = root / "meta_expressions" / split
    md.mkdir(parents=True)
    meta = {"videos": {"vid1": {
        "frames": ["00000", "00005"],
        "expressions": {
            "0": {"exp": "a Person"},
            "1": {"exp": "red car"},
        },
    }}}
    (md / "meta_expressions.json").write_text(json.dumps(meta))
    jd = root / split / "JPEGImages" / "vid1"
    jd.mkdir(parents=True)
    for name in ["00000", "00005"]:
        Image.fromarray(
            np.zeros((12, 16, 3), np.uint8)
        ).save(str(jd / f"{name}.jpg"))
    return str(root), split


def test_resolve_layout_prefers_ytvos_nesting(ytvos_fixture):
    root, split = ytvos_fixture
    ann, frames = resolve_layout(root, split, "ytvos")
    assert ann.endswith(
        os.path.join("meta_expressions", split, "meta_expressions.json")
    )
    assert frames.endswith(os.path.join(split, "JPEGImages"))


def test_ytvos_submission_inference(ytvos_fixture, tmp_path):
    from PIL import Image

    root, split = ytvos_fixture
    out = str(tmp_path / "Annotations")
    seg = _FakeSegmentor()
    n = run_inference(seg, root, split, out, benchmark="ytvos")
    assert n == 2
    # reference prompt template used verbatim (lowercased expression)
    assert seg.questions == [
        "Please segment the a person in this image.",
        "Please segment the red car in this image.",
    ]
    # per-video/per-expression PNG tree named by frame (submission layout)
    for exp_id in ("0", "1"):
        for name in ("00000", "00005"):
            p = os.path.join(out, "vid1", exp_id, f"{name}.png")
            assert os.path.exists(p), p
            arr = np.asarray(Image.open(p))
            assert arr.shape == (12, 16)
            assert set(np.unique(arr)) <= {0, 255}
    # idempotent resume: complete trees are skipped
    seg2 = _FakeSegmentor()
    assert run_inference(seg2, root, split, out, benchmark="ytvos") == 0
    assert seg2.questions == []


def test_reasonvos_list_expressions_layout(tmp_path):
    """ReasonVOS stores expressions as a LIST with exp_text/is_sent and a
    per-video source; jobs write under source_vid_obj while frames load
    from the raw video dir (ref inference_reason_vos.py:129-140)."""
    import json

    from rga3_tpu.evaluation.video_seg_eval import load_meta_expressions

    ann = tmp_path / "meta_expressions.json"
    ann.write_text(json.dumps({"videos": {"vidA": {
        "source": "davis",
        "frames": ["00001", "00000"],
        "expressions": [
            {"obj_id": 2, "exp_id": 0, "exp_text": "the tool being used",
             "is_sent": True},
            {"obj_id": 2, "exp_id": 1, "exp_text": "a red thing",
             "is_sent": False},
        ],
    }}}))
    jobs = load_meta_expressions(str(ann))
    assert len(jobs) == 2
    assert jobs[0]["video"] == "davis_vidA_2"
    assert jobs[0]["frames_dir"] == "vidA"
    assert jobs[0]["exp"] == "the tool being used"
    assert jobs[0]["is_sent"] is True and jobs[1]["is_sent"] is False
    assert jobs[0]["frames"] == ["00000", "00001"]


def test_resolve_layout_revos_root(tmp_path):
    import os

    from rga3_tpu.evaluation.video_seg_eval import resolve_layout

    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "meta_expressions_valid_.json").write_text("{}")
    ann, frames = resolve_layout(str(tmp_path), "valid", "revos")
    assert ann.endswith("meta_expressions_valid_.json")
    assert frames == os.path.join(str(tmp_path), "JPEGImages")
