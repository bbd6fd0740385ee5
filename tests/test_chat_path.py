"""UniGRChat end-to-end: processor -> vision layout -> generate -> decode."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.data.processor import QwenVLProcessor
from rga3_tpu.evaluation.segmentor import UniGRChat
from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.model import Qwen25VL

from tests.test_data_pipeline import DummyTokenizer


class DecodingTokenizer(DummyTokenizer):
    def decode(self, ids):
        return " ".join(f"tok{i}" for i in ids)


@pytest.fixture(scope="module")
def chat():
    cfg = tiny_config(vocab_size=152_000)
    model = Qwen25VL(cfg)
    proc = QwenVLProcessor(
        DecodingTokenizer(), min_pixels=4 * 28 * 28,
        max_pixels=16 * 28 * 28, video_max_pixels=16 * 28 * 28,
    )
    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 255, (56, 56, 3), dtype=np.uint8) for _ in range(2)
    ]
    enc = proc(
        [
            __import__("rga3_tpu.data.processor", fromlist=["ChatMessage"])
            .ChatMessage("user", [{"type": "video"},
                                  {"type": "text", "text": "hi"}])
        ],
        videos=[frames],
    )
    from rga3_tpu.models.qwen25vl.vision import (
        compute_vision_layout, layout_device_args,
    )

    layout = compute_vision_layout(enc["video_grid_thw"], cfg.vision)
    la = layout_device_args(layout, cfg.vision)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(enc["input_ids"], jnp.int32),
        pixel_patches=jnp.asarray(enc["pixel_values_videos"]),
        vision_layout=la,
    )
    c = UniGRChat(model, params, proc, max_new_tokens=4,
                  compute_dtype=jnp.float32)
    return c, frames


def test_chat_answer_returns_text(chat):
    c, frames = chat
    out = c.answer("What is shown?", video_frames=frames)
    assert isinstance(out, str)
    assert len(out) > 0


@pytest.mark.slow
def test_chat_accepts_unigr_composite(chat):
    """UniGRChat slices model.qwen + params subtree internally so QA
    drivers pass the composite directly."""
    from rga3_tpu.config import SegHeadConfig
    from rga3_tpu.models.sam2 import tiny_sam2_config
    from rga3_tpu.models.unigr import UniGR, UniGRConfig

    c, frames = chat
    cfg = UniGRConfig(
        qwen=tiny_config(vocab_size=152_000),
        sam2=tiny_sam2_config(image_size=64).replace(d_model=32),
        seg=SegHeadConfig(out_dim=32, seg_token_id=151665),
    )
    model = UniGR(cfg)
    ids = np.zeros((1, 8), np.int32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 1, 32)),
        jnp.asarray(ids),
    )
    proc = c.processor
    chat2 = UniGRChat(model, params, proc, max_new_tokens=2,
                      compute_dtype=jnp.float32)
    out = chat2.answer("What is shown?", video_frames=frames)
    assert isinstance(out, str) and len(out) > 0


def test_chat_suppress_ids_respected(chat):
    c, frames = chat
    base = c.answer("What is shown?", video_frames=frames)
    first_tok = int(base.split()[0].replace("tok", ""))
    out = c.answer(
        "What is shown?", video_frames=frames, suppress_ids=[first_tok]
    )
    toks = [int(t.replace("tok", "")) for t in out.split()]
    assert first_tok not in toks


@pytest.mark.slow
def test_answer_batch_matches_sequential(chat):
    """Batched prefill+decode (right-padded, shared vision scatter) must
    reproduce the per-sample greedy answers."""
    c, frames = chat
    rng = np.random.default_rng(7)
    frames2 = [
        rng.integers(0, 255, (56, 56, 3), dtype=np.uint8) for _ in range(2)
    ]
    qs = ["What is shown?", "Describe the motion in detail please."]
    seq = [
        c.answer(qs[0], video_frames=frames),
        c.answer(qs[1], video_frames=frames2),
    ]
    batch = c.answer_batch(qs, video_frames_list=[frames, frames2])
    assert batch == seq


@pytest.mark.slow
def test_answer_batch_rejects_mixed_modality(chat):
    c, frames = chat
    with pytest.raises(ValueError):
        c.answer_batch(
            ["q"], video_frames_list=[frames],
            images_list=[[np.zeros((28, 28, 3), np.uint8)]],
        )


@pytest.mark.slow
def test_chat_speculative_draft_matches_plain(chat):
    """UniGRChat with a draft model (here: the target itself) answers
    byte-identically to plain greedy — speculative decode is exact."""
    c, frames = chat
    plain = c.answer("Describe the video.", video_frames=frames)
    spec = UniGRChat(
        c.model, c.params, c.processor, max_new_tokens=4,
        compute_dtype=jnp.float32,
        draft_model=c.model, draft_params=c.params, spec_k=2,
    )
    out = spec.answer("Describe the video.", video_frames=frames)
    assert out == plain
