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


@pytest.fixture()
def refer_vqa_root(tmp_path):
    rng = np.random.default_rng(1)
    # ViP-LLaVA stage2 fixture with a bbox visual prompt
    root = tmp_path / "ViP-LLaVA-Instruct"
    (root / "vg").mkdir(parents=True)
    Image.fromarray(
        rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    ).save(root / "vg" / "img1.jpg")
    items = [
        {
            "id": "vip0",
            "image": "vg/img1.jpg",
            "bboxes": [[10, 10, 50, 40]],
            "segmentations": [None],
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is <within region0>?"},
                {"from": "gpt", "value": "A box."},
            ],
        },
        {  # filtered out: not vg/ocr_vqa/gqa/refcoco
            "id": "skipme",
            "image": "other/img.jpg",
            "conversations": [],
        },
    ]
    with open(root / "vip-llava_stage2_mix.json", "w") as f:
        json.dump(items, f)

    # Osprey fixture
    od = tmp_path / "Osprey-724K"
    od.mkdir()
    img_dir = tmp_path / "coco" / "train2014"
    img_dir.mkdir(parents=True)
    Image.fromarray(
        rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    ).save(img_dir / "osp.jpg")
    oitems = [{
        "file_name": "osp.jpg",
        "annotation": [
            {"bbox": [5, 5, 30, 20],
             "segmentation": [[5, 5, 35, 5, 35, 25, 5, 25]]},
        ],
        "conversations": [
            {"from": "human", "value": "Describe <region1>."},
            {"from": "gpt", "value": "A rectangle."},
        ],
    }]
    with open(od / "osprey_conversation.json", "w") as f:
        json.dump(oitems, f)
    return str(tmp_path)


def test_refer_vqa_vip_llava_overlay(refer_vqa_root):
    from rga3_tpu.data.datasets.qa import ReferVQADataset

    ds = ReferVQADataset(refer_vqa_root, ref_vqa_dataset="vip_llava_stage2-3")
    assert len(ds) == 1  # the non-vg item is filtered (ref :155-186)
    s = ds.sample()
    assert not s.has_masks
    assert "Look at the marked region" in s.messages[0].content[-1]["text"]
    # the overlay changed pixels vs the raw image
    raw = np.asarray(Image.open(
        os.path.join(refer_vqa_root, "ViP-LLaVA-Instruct", "vg", "img1.jpg")
    ))
    assert s.images[0].shape == raw.shape
    assert (s.images[0] != raw).any()


def test_refer_vqa_osprey(refer_vqa_root):
    from rga3_tpu.data.datasets.qa import ReferVQADataset

    ds = ReferVQADataset(refer_vqa_root, ref_vqa_dataset="osprey")
    assert len(ds) == 1
    s = ds.sample()
    assert not s.has_masks
    assert s.sample_id.startswith("osprey-conv-")
