"""End-to-end data pipeline: synthetic MeViS + ReasonSeg fixtures on disk ->
hybrid mixer -> collate -> tiny UniGR train_forward."""
import json
import os
import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from rga3_tpu.config import SegHeadConfig
from rga3_tpu.data.collate import collate, mask_labels
from rga3_tpu.data.datasets import ImgVidHybridDataset
from rga3_tpu.data.processor import QwenVLProcessor
from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.config import (
    IM_END_TOKEN_ID, IM_START_TOKEN_ID, ENDOFTEXT_TOKEN_ID,
    VIDEO_PAD_TOKEN_ID, IMAGE_PAD_TOKEN_ID, VISION_START_TOKEN_ID,
    VISION_END_TOKEN_ID,
)
from rga3_tpu.utils import rle

SEG_ID = 151665

SPECIALS = {
    "<|im_start|>": IM_START_TOKEN_ID,
    "<|im_end|>": IM_END_TOKEN_ID,
    "<|endoftext|>": ENDOFTEXT_TOKEN_ID,
    "<|vision_start|>": VISION_START_TOKEN_ID,
    "<|vision_end|>": VISION_END_TOKEN_ID,
    "<|image_pad|>": IMAGE_PAD_TOKEN_ID,
    "<|video_pad|>": VIDEO_PAD_TOKEN_ID,
    "[SEG]": SEG_ID,
    "user": 872,
    "assistant": 77091,
}


class DummyTokenizer:
    """Minimal word-level tokenizer with real special-token ids."""

    pad_token_id = ENDOFTEXT_TOKEN_ID

    def convert_tokens_to_ids(self, tok):
        return SPECIALS.get(tok, abs(hash(tok)) % 50000 + 1000)

    def __call__(self, text, add_special_tokens=False):
        pattern = "|".join(re.escape(s) for s in SPECIALS if s.startswith("<")
                           or s == "[SEG]")
        parts = re.split(f"({pattern})", text)
        ids = []
        for p in parts:
            if not p:
                continue
            if p in SPECIALS:
                ids.append(SPECIALS[p])
            else:
                for w in p.replace("\n", " \n ").split(" "):
                    if w:
                        ids.append(self.convert_tokens_to_ids(w))
        return {"input_ids": ids}


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    # --- MeViS fixture
    mdir = root / "mevis" / "train"
    (mdir / "JPEGImages" / "vid0").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = [f"{i:05d}" for i in range(4)]
    for f in frames:
        Image.fromarray(
            rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        ).save(mdir / "JPEGImages" / "vid0" / f"{f}.jpg")
    mask = np.zeros((60, 80), np.uint8)
    mask[20:40, 30:60] = 1
    mask_dict = {"7": [rle.encode(mask) for _ in frames]}
    with open(mdir / "mask_dict.json", "w") as f:
        json.dump(mask_dict, f)
    meta = {"videos": {"vid0": {
        "frames": frames,
        "expressions": {"0": {"exp": "the moving box", "anno_id": ["7"],
                              "obj_id": [1]}},
    }}}
    with open(mdir / "meta_expressions.json", "w") as f:
        json.dump(meta, f)

    # --- ReasonSeg fixture
    rdir = root / "reason_seg" / "ReasonSeg" / "train"
    rdir.mkdir(parents=True)
    img = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    Image.fromarray(img).save(rdir / "a.jpg")
    anno = {
        "shapes": [{"label": "target", "points": [[10, 10], [40, 10],
                                                  [40, 30], [10, 30]]}],
        "text": ["the thing you would sit on"],
        "is_sentence": True,
    }
    with open(rdir / "a.json", "w") as f:
        json.dump(anno, f)
    return str(root)


@pytest.mark.slow
def test_hybrid_and_collate_to_train_forward(data_root):
    hybrid = ImgVidHybridDataset(
        data_root,
        datasets=["mevis", "reason_seg"],
        sample_rates=[1.0, 1.0],
        samples_per_epoch=4,
        num_frames_mllm=4,
        num_frames_sam=2,
        mask_res=64,
        sam_size=64,
    )
    proc = QwenVLProcessor(
        DummyTokenizer(), min_pixels=4 * 28 * 28, max_pixels=16 * 28 * 28,
        video_max_pixels=16 * 28 * 28,
    )
    qcfg = tiny_config(vocab_size=152_000)
    batch = [hybrid[0], hybrid[1]]
    out = collate(batch, proc, qcfg)

    assert out["input_ids"].shape == out["labels"].shape
    assert out["images_sam"].shape[:2] == (2, 2)
    assert out["gt_masks"].shape[:2] == (2, 2)
    # assistant spans are supervised, user spans are not
    assert (out["labels"] != -100).any()
    # [SEG] appears in labels for seg samples
    assert (out["labels"] == SEG_ID).sum() >= 1

    # feed through tiny UniGR train_forward (text-only path: no vision
    # patches wired here; pixel inputs tested separately)
    from rga3_tpu.models.sam2 import tiny_sam2_config
    from rga3_tpu.models.unigr import UniGR, UniGRConfig

    cfg = UniGRConfig(
        qwen=qcfg,
        sam2=tiny_sam2_config(image_size=64).replace(d_model=32),
        seg=SegHeadConfig(out_dim=32, seg_token_id=SEG_ID),
    )
    model = UniGR(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(out["images_sam"][0]),
        jnp.zeros((2, 1, 32), jnp.float32),
        jnp.asarray(out["input_ids"]),
    )
    res = model.apply(
        params,
        jnp.asarray(out["input_ids"]),
        jnp.asarray(out["labels"]),
        jnp.asarray(out["position_ids"]),
        jnp.asarray(out["attention_mask"]).astype(jnp.int32),
        jnp.asarray(out["images_sam"]),
        jnp.asarray(out["gt_masks"]),
        jnp.asarray(out["masks_valid"]),
        compute_dtype=jnp.float32,
        method=UniGR.train_forward,
    )
    assert np.isfinite(float(res["loss"]))
    assert float(res["mask_loss"]) > 0  # seg samples supervise masks


def test_mask_labels_spans():
    tok = DummyTokenizer()
    text = (
        "<|im_start|>system\nsys<|im_end|>\n"
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\nworld [SEG]<|im_end|>\n"
    )
    ids = np.asarray([tok(text)["input_ids"]], np.int32)
    labels = mask_labels(ids, tok, tok.pad_token_id)
    sup = labels[0][labels[0] != -100]
    assert SEG_ID in sup.tolist()
    assert IM_END_TOKEN_ID in sup.tolist()
    hello_id = tok.convert_tokens_to_ids("hello")
    assert hello_id not in sup.tolist()
