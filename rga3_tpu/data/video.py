"""Host-side video frame loading (cv2-based; replaces decord + the
reference's VideoCapture — ref utils/video_capture.py:7-60,
utils/videoqa_dataset.py:13).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .templates import get_sparse_indices


def load_frames_from_video(
    video_path: str,
    num_frames: Optional[int] = None,
    sample_fps: Optional[float] = None,
) -> Tuple[List[np.ndarray], List[int], float]:
    """Returns (RGB frames, frame indices, native fps).

    num_frames: uniform-sample this many frames (ref get_sparse_indices).
    sample_fps: alternatively sample at this rate.
    """
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0

    if num_frames is not None:
        idxs = get_sparse_indices(total, num_frames)
    elif sample_fps is not None:
        step = max(1, round(fps / sample_fps))
        idxs = list(range(0, total, step))
    else:
        idxs = list(range(total))

    frames = []
    want = sorted(set(idxs))
    got = {}
    pos = 0
    for i in range(total):
        ok = cap.grab()
        if not ok:
            break
        if pos < len(want) and i == want[pos]:
            ok, frame = cap.retrieve()
            if not ok:
                break
            got[i] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            pos += 1
        if pos >= len(want):
            break
    cap.release()
    frames = [got[i] for i in idxs if i in got]
    return frames, idxs, fps


def load_frames_from_dir(
    frames_dir: str, indices: Optional[Sequence[int]] = None
) -> List[np.ndarray]:
    """Load frames stored as image files (the VOS dataset layout)."""
    from PIL import Image

    names = sorted(
        f for f in os.listdir(frames_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if indices is not None:
        names = [names[i] for i in indices]
    return [
        np.asarray(Image.open(os.path.join(frames_dir, f)).convert("RGB"))
        for f in names
    ]
