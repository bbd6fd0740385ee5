"""Shared dataset machinery for the 10-way hybrid training mixture
(SURVEY.md §2.7). Host-side numpy only.

Common behaviors, matched to the reference datasets:
  * SAM frames: DirectResize to 1024² + ImageNet-stat normalize
    (ref: utils/utils.py:232-258).
  * Image datasets repeat a still image into num_frames_sam pseudo-video
    frames (ref: sem_seg/refer_seg/reason_seg *PseudoVid* datasets).
  * Video datasets sample num_frames_mllm sparse frames for the MLLM and a
    random num_frames_sam subset of those for SAM
    (ref: mevis_dataset.py:76-99, 235-263).
  * Questions/answers from the shared template lists; answers embed [SEG].
  * GT masks are emitted at a fixed `mask_res` canvas (nearest resize) so
    batches are static-shape; the reference instead resizes predictions to
    each sample's native GT resolution (qwen_2_5_vl_sam2.py:273) — same
    objective, swapped interpolation side.
"""
from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..processor import ChatMessage
from ..templates import (
    ANSWER_LIST,
    LONG_QUESTION_LIST,
    SHORT_QUESTION_LIST,
    get_sparse_indices,
)

SAM_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


def sam_preprocess_frame(
    frame: np.ndarray, size: int = 1024, normalize: bool = True
) -> np.ndarray:
    """HWC uint8 -> (size, size, 3) float32 normalized (DirectResize +
    ImageNet stats).

    normalize=False returns the resized frame as UINT8 (lossless — the
    resize output is integer-valued) and the SAM entry points apply the
    same `(x - mean) / std` on device (ops.resize.sam_normalize_maybe):
    bit-identical at 4x fewer host->device bytes. The train datasets use
    this path; every dataset must agree on the dtype, since collate
    stacks sam_frames across the hybrid batch."""
    from PIL import Image

    img = np.asarray(Image.fromarray(frame).resize((size, size)))
    if not normalize:
        return img
    return (img.astype(np.float32) - SAM_MEAN) / SAM_STD


def resize_mask(mask: np.ndarray, res: int) -> np.ndarray:
    """Nearest-resize a binary mask to (res, res)."""
    from PIL import Image

    return np.asarray(
        Image.fromarray((mask > 0).astype(np.uint8)).resize(
            (res, res), Image.NEAREST
        ),
        np.float32,
    )


def seg_qa_messages(
    frames: Sequence[np.ndarray],
    question: str,
    answer: str,
) -> List[ChatMessage]:
    return [
        ChatMessage("user", [
            {"type": "video"},
            {"type": "text", "text": question},
        ]),
        ChatMessage("assistant", [{"type": "text", "text": answer}]),
    ]


def make_seg_question(text: str, long: bool = False) -> str:
    if long:
        return random.choice(LONG_QUESTION_LIST).format(sent=text)
    return random.choice(SHORT_QUESTION_LIST).format(class_name=text.lower())


def make_seg_answer() -> str:
    return random.choice(ANSWER_LIST)


def random_dense_subset(num_frames_mllm: int, num_frames_sam: int) -> List[int]:
    """Random sorted subset (ref mevis_dataset.get_dense_indices :76-80)."""
    return sorted(
        np.random.choice(
            num_frames_mllm, size=num_frames_sam, replace=False
        ).tolist()
    )


class TaskDataset:
    """Base: __len__ is samples_per_epoch-agnostic; the hybrid mixer calls
    `sample()` which picks a random underlying item (the reference's
    random-idx __getitem__ convention)."""

    name = "base"

    def __len__(self) -> int:
        raise NotImplementedError

    def sample(self):
        raise NotImplementedError


def build_pseudo_video_sample(
    sample_id: str,
    image: np.ndarray,  # HWC uint8
    mask: np.ndarray,  # (H, W) binary
    question: str,
    answer: str,
    num_frames_mllm: int,
    num_frames_sam: int,
    sam_size: int = 1024,
    mask_res: int = 256,
):
    """Image -> pseudo-video TrainSample (image repeated across frames)."""
    from ..collate import TrainSample

    sam_frame = sam_preprocess_frame(image, sam_size, normalize=False)
    sam_frames = np.repeat(sam_frame[None], num_frames_sam, axis=0)
    gt = np.repeat(
        resize_mask(mask, mask_res)[None], num_frames_sam, axis=0
    )
    frames = [image] * num_frames_mllm
    return TrainSample(
        sample_id=sample_id,
        messages=seg_qa_messages(frames, question, answer),
        video_frames=frames,
        sam_frames=sam_frames,
        gt_masks=gt,
        has_masks=True,
    )
