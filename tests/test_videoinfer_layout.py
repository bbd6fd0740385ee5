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


def test_run_inference_batched_stom_matches_sequential(tmp_path):
    """batch_size>1 propagates the batch's overlays in ONE
    propagate_in_video_batch call and produces the same predictions as
    the sequential path (same STOM math, same frames to the chat)."""
    import numpy as np

    from rga3_tpu.evaluation.videoinfer_eval import run_inference

    rng = np.random.default_rng(0)
    T, H, W = 4, 64, 80

    def make_item(iid, has_overlay=True):
        frames = []
        for i in range(T):
            f = np.full((H, W, 3), 20, np.uint8)
            f[20:40, 10 + 5 * i:30 + 5 * i] = rng.integers(
                0, 255, (20, 20, 3), dtype=np.uint8)
            frames.append(f)
        overlay = None
        if has_overlay:
            overlay = np.zeros((H, W, 4), np.uint8)
            overlay[18:42, 8:32] = (255, 0, 0, 150)
            overlay[22:38, 12:28] = 0
        return {"id": iid, "frames": frames, "question": f"q {iid}",
                "vip_overlay": overlay, "key_idx": 0,
                "shape": "rectangle"}

    items = [make_item("a"), make_item("b"), make_item("c", False)]

    class StubChat:
        def __init__(self):
            self.frames_seen = {}

        def answer(self, question, video_frames=None):
            self.frames_seen[question] = [f.copy() for f in video_frames]
            return f"ans:{question}"

        def answer_batch(self, questions, video_frames_list=None):
            for q, fl in zip(questions, video_frames_list):
                self.frames_seen[q] = [f.copy() for f in fl]
            return [f"ans:{q}" for q in questions]

    seq_chat, bat_chat = StubChat(), StubChat()
    p_seq, p_bat = str(tmp_path / "seq.jsonl"), str(tmp_path / "bat.jsonl")
    n1 = run_inference(seq_chat, items, p_seq, use_stom=True)
    n2 = run_inference(bat_chat, items, p_bat, use_stom=True,
                       batch_size=2)
    assert n1 == n2 == 3
    import json

    seq = {json.loads(l)["id"]: json.loads(l)["pred"]
           for l in open(p_seq)}
    bat = {json.loads(l)["id"]: json.loads(l)["pred"]
           for l in open(p_bat)}
    assert seq == bat
    # identical propagated frames fed to the chat in both modes
    for q in seq_chat.frames_seen:
        for a, b in zip(seq_chat.frames_seen[q], bat_chat.frames_seen[q]):
            assert np.array_equal(a, b)
