"""VideoInfer published-dataset layout: load_items reads the reference's
exact file format (nested test.json, frames/, visual_prompts npz,
mask_dict.json) and the eval_result/GPT-batch round-trip works on it."""
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rga3_tpu.evaluation.gpt_judge import build_videoinfer_batch_requests
from rga3_tpu.evaluation.videoinfer_eval import build_eval_result
from scripts.eval_videoinfer import load_items, load_qa_data


def make_dataset(root, n_frames=6):
    rng = np.random.default_rng(0)
    vid, exp = "video0001", "0"
    fdir = os.path.join(root, "frames", vid)
    os.makedirs(fdir)
    for i in range(n_frames):
        Image.fromarray(
            rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        ).save(os.path.join(fdir, f"{i:05d}.jpg"))
    vdir = os.path.join(root, "visual_prompts", vid, exp)
    os.makedirs(vdir)
    overlay = np.zeros((32, 48, 4), np.uint8)
    overlay[8:16, 10:20] = (255, 0, 0, 200)
    np.savez(os.path.join(vdir, "rectangle.npz"), overlay)  # key arr_0
    qa = {
        vid: {"expressions": {exp: {
            "QA": {
                "q0": {"Q": "What is the object doing?", "A": "moving"},
                "q1": {"Q": "What color is it?", "A": "red"},
            },
            "overlayed_frame_idx": 2,
            "color": "red",
            "shape": "rectangle",
            "anno_id": 7,
        }}},
    }
    with open(os.path.join(root, "test.json"), "w") as f:
        json.dump(qa, f)
    with open(os.path.join(root, "mask_dict.json"), "w") as f:
        json.dump({"7": [None] * n_frames}, f)
    return qa


def test_load_items_published_layout(tmp_path):
    root = str(tmp_path / "videoinfer")
    os.makedirs(root)
    make_dataset(root)
    items = list(load_items(root, num_frames=4))
    assert len(items) == 2  # one per QA
    it = items[0]
    assert it["id"] == "video0001____0____q0"
    assert it["shape"] == "rectangle" and it["color"] == "red"
    # 3 sparse + the overlayed frame
    assert len(it["frames"]) == 4
    assert it["frames"][0].shape == (32, 48, 3)
    assert it["vip_overlay"].shape == (32, 48, 4)
    assert it["vip_overlay"][10, 15, 3] == 200
    # key_idx points at the overlayed frame inside the sampled list
    assert 0 <= it["key_idx"] < 4
    assert it["question"] == "What is the object doing?"
    assert it["answer"] == "moving"


def test_eval_result_and_batch_requests(tmp_path):
    root = str(tmp_path / "videoinfer")
    os.makedirs(root)
    qa = make_dataset(root)
    pred_path = str(tmp_path / "pred.jsonl")
    with open(pred_path, "w") as f:
        f.write(json.dumps(
            {"id": "video0001____0____q0", "pred": "it is moving"}
        ) + "\n")
        f.write(json.dumps(
            {"id": "video0001____0____q1", "pred": "red"}
        ) + "\n")
    res = build_eval_result(pred_path, load_qa_data(root))
    assert res["video0001"]["0"]["q0"]["pred_answer"] == "it is moving"
    assert res["video0001"]["0"]["q1"]["gt_answer"] == "red"
    reqs = build_videoinfer_batch_requests(res)
    assert {r["custom_id"] for r in reqs} == {
        "video0001____0____q0", "video0001____0____q1"
    }
