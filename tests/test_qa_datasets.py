"""QA dataset fixtures: LLaVA-style VQA and VideoInfer region QA."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from rga3_tpu.data.datasets.qa import ReferVideoQADataset, VQADataset
from rga3_tpu.utils import rle


@pytest.fixture()
def qa_root(tmp_path):
    # LLaVA-Instruct fixture
    d = tmp_path / "llava_dataset"
    d.mkdir()
    img_dir = tmp_path / "coco" / "train2017"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
    ).save(img_dir / "img0.jpg")
    items = [{
        "id": "vqa0",
        "image": "img0.jpg",
        "conversations": [
            {"from": "human", "value": "<image>\nWhat is it?"},
            {"from": "gpt", "value": "A test pattern."},
        ],
    }]
    with open(d / "llava_instruct_150k.json", "w") as f:
        json.dump(items, f)

    # VideoInfer fixture
    vd = tmp_path / "videoinfer"
    frames_dir = vd / "frames" / "vidA"
    frames_dir.mkdir(parents=True)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        ).save(frames_dir / f"{i:05d}.jpg")
    mask = np.zeros((40, 50), np.uint8)
    mask[10:30, 10:40] = 1
    vitems = [{
        "id": "vi0",
        "video": "vidA",
        "masks": {"00000": rle.encode(mask)},
        "conversations": [
            {"from": "human", "value": "<video>\nWhat is marked?"},
            {"from": "gpt", "value": "A box."},
        ],
    }]
    with open(vd / "videoinfer_train.json", "w") as f:
        json.dump(vitems, f)
    return str(tmp_path)


def test_vqa_dataset_sample(qa_root):
    ds = VQADataset(qa_root, num_frames_sam=2, sam_size=64, mask_res=32)
    assert len(ds) == 1
    s = ds.sample()
    assert not s.has_masks  # QA-only: zero-mask sentinel
    assert s.images and s.images[0].shape == (40, 50, 3)
    assert s.messages[0].role == "user"
    assert s.messages[1].content[0]["text"] == "A test pattern."
    assert s.sam_frames.shape == (2, 64, 64, 3)


def test_refer_videoqa_overlays_keyframe(qa_root):
    np.random.seed(0)
    import random

    random.seed(3)
    ds = ReferVideoQADataset(
        qa_root, num_frames_mllm=3, num_frames_sam=2,
        sam_size=64, mask_res=32,
    )
    assert len(ds) == 1
    s = ds.sample()
    assert not s.has_masks
    assert len(s.video_frames) == 3
    # the question is prefixed with the visual-prompt sentence
    q = s.messages[0].content[-1]["text"]
    assert q.startswith("Look at the marked region")
