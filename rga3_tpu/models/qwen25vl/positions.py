"""M-RoPE position-id computation (host-side numpy).

Rebuild of HF `get_rope_index` for Qwen2.5-VL, which the reference relies on
through transformers (grid_thw / second_per_grid_ts plumbed at
ref qwen_2_5_vl_sam2.py:163-167,199). Text tokens advance all three streams
together; vision spans get (temporal, row, col) positions, with video
temporal steps scaled by `second_per_grid_ts * tokens_per_second`.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .config import Qwen25VLConfig


def get_rope_index(
    cfg: Qwen25VLConfig,
    input_ids: np.ndarray,  # (B, L)
    image_grid_thw: Optional[Sequence[Tuple[int, int, int]]] = None,
    video_grid_thw: Optional[Sequence[Tuple[int, int, int]]] = None,
    second_per_grid_ts: Optional[Sequence[float]] = None,
    attention_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (position_ids (3, B, L), rope_deltas (B,)).

    rope_delta = (max position + 1) - seq_len; decode positions continue at
    cache_len + rope_delta (HF convention).
    """
    b, l = input_ids.shape
    sms = cfg.vision.spatial_merge_size
    tps = cfg.vision.tokens_per_second
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)

    position_ids = np.zeros((3, b, l), dtype=np.int64)
    rope_deltas = np.zeros((b,), dtype=np.int64)

    img_iter = iter(image_grid_thw or [])
    vid_iter = iter(video_grid_thw or [])
    spg_iter = iter(second_per_grid_ts or [])

    for bi in range(b):
        ids = input_ids[bi][attention_mask[bi] == 1]
        pos_chunks: List[np.ndarray] = []
        st = 0  # index into ids
        st_idx = 0  # next position value
        n = len(ids)
        while st < n:
            # find next vision pad run
            is_vis = (ids[st:] == cfg.image_token_id) | (
                ids[st:] == cfg.video_token_id
            )
            nxt = np.argmax(is_vis) if is_vis.any() else len(is_vis)
            if nxt > 0:
                text_pos = st_idx + np.arange(nxt)
                pos_chunks.append(np.tile(text_pos, (3, 1)))
                st_idx = st_idx + nxt
                st += nxt
                if not is_vis.any():
                    break
                continue
            # vision span
            tok = ids[st]
            if tok == cfg.image_token_id:
                t, h, w = next(img_iter)
                spg = 0.0
            else:
                t, h, w = next(vid_iter)
                try:
                    spg = float(next(spg_iter))
                except StopIteration:
                    spg = 1.0
            lt, lh, lw = int(t), int(h) // sms, int(w) // sms
            span = lt * lh * lw
            # HF casts second_per_grid_t to the int64 dtype of the range
            # tensor BEFORE multiplying (truncation toward zero) — match it
            # exactly for positional parity
            spg_i = int(spg)
            t_idx = np.repeat(
                (np.arange(lt) * spg_i * tps).astype(np.int64), lh * lw
            )
            h_idx = np.tile(np.repeat(np.arange(lh), lw), lt)
            w_idx = np.tile(np.tile(np.arange(lw), lh), lt)
            pos_chunks.append(
                np.stack([t_idx, h_idx, w_idx]) + st_idx
            )
            st_idx = int(pos_chunks[-1].max()) + 1
            st += span
        if pos_chunks:
            pos = np.concatenate(pos_chunks, axis=1)
        else:
            pos = np.zeros((3, 0), np.int64)
        # place into padded positions (right padding assumed; left-pad safe
        # because we index by mask)
        sel = np.where(attention_mask[bi] == 1)[0]
        position_ids[:, bi, sel] = pos
        rope_deltas[bi] = (pos.max() + 1 if pos.size else 0) - len(ids)

    return position_ids, rope_deltas
