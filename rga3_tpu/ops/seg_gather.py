"""[SEG]-token hidden-state extraction.

The reference finds [SEG] in `labels`, shifts the mask left by one (the
hidden state *preceding* the [SEG] label position predicts it), projects the
final hidden states, boolean-indexes the [SEG] embeddings, and tiles them
across SAM frames with per-sample offsets
(ref: model/qwen_2_5_vl_sam2.py:209-234).

TPU-first redesign: boolean indexing is a dynamic shape, so we gather the
FIRST [SEG] embedding per sample with a one-hot matmul (every training and
eval sample in the reference carries at most one [SEG]; `num_objs = 1` at
qwen_2_5_vl_sam2.py:262 and single-sample eval at :341). Samples without a
[SEG] get a zero embedding and a `has_seg=False` flag — the static-shape
equivalent of the reference's zero-embedding branch (:229-231).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def shift_seg_mask(token_ids: jnp.ndarray, seg_token_id: int) -> jnp.ndarray:
    """(B, L) ids/labels -> (B, L) bool mask, shifted left by one.

    Matches `torch.cat([mask[:, 1:], zeros], dim=1)`
    (ref: qwen_2_5_vl_sam2.py:209-210).
    """
    mask = token_ids == seg_token_id
    return jnp.concatenate(
        [mask[:, 1:], jnp.zeros_like(mask[:, :1])], axis=1
    )


def gather_seg_embeddings(
    hidden: jnp.ndarray,
    token_ids: jnp.ndarray,
    seg_token_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract one [SEG] embedding per sample.

    hidden:    (B, L, D) projected final hidden states.
    token_ids: (B, L) labels (training) or input_ids (eval).
    Returns (emb (B, D), has_seg (B,) bool). If a sample has multiple [SEG]
    tokens only the first is used; without one, emb is zeros.
    """
    mask = shift_seg_mask(token_ids, seg_token_id)  # (B, L)
    has_seg = jnp.any(mask, axis=1)
    first = jnp.argmax(mask, axis=1)  # 0 if none — gated by has_seg below
    onehot = jnp.zeros(mask.shape, hidden.dtype).at[
        jnp.arange(mask.shape[0]), first
    ].set(1.0)
    emb = jnp.einsum("bl,bld->bd", onehot, hidden)
    emb = emb * has_seg[:, None].astype(emb.dtype)
    return emb, has_seg


def tile_seg_embeddings(
    emb: jnp.ndarray, num_frames: int
) -> jnp.ndarray:
    """(B, D) -> (B*T, 1, D): one language prompt per SAM frame
    (ref tiling loop: qwen_2_5_vl_sam2.py:226-234)."""
    b, d = emb.shape
    return jnp.broadcast_to(emb[:, None, :], (b, num_frames, d)).reshape(
        b * num_frames, 1, d
    )
