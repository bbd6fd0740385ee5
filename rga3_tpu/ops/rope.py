"""Rotary position embeddings: 1D RoPE, Qwen2.5-VL M-RoPE, Qwen ViT 2D
vision RoPE, and SAM2's 2D axial (interleaved-pair) RoPE.

Conventions (must match the released checkpoints bit-for-bit at fp32):
  * Text / vision RoPE uses the "rotate_half" layout: the head dim is split
    into two halves [x1, x2] and rotated as (x1*cos - x2*sin, x2*cos + x1*sin)
    with cos/sin duplicated across halves (HF transformers convention, which
    the reference consumes via `transformers` Qwen2.5-VL — SURVEY.md §2.3).
  * SAM2 memory attention uses interleaved complex pairs (even/odd dims), the
    `compute_axial_cis`/`apply_rotary_enc` scheme
    (ref: model/sam2.py:1874-1924).
All tables are computed in fp32.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def rope_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float = 1_000_000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables in rotate_half layout.

    positions: (..., L) int array. Returns cos, sin of shape (..., L, head_dim).
    """
    inv = rope_inv_freq(head_dim, theta)
    freqs = positions.astype(jnp.float32)[..., None] * inv  # (..., L, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """x: (..., L, num_heads, head_dim); cos/sin: broadcastable (..., L, 1, D)
    or (..., L, D) — we insert the head axis if missing."""
    if cos.ndim == x.ndim - 1:
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    out = x32 * cos + rotate_half(x32) * sin
    return out.astype(orig)


def mrope_cos_sin(
    position_ids: jnp.ndarray,
    head_dim: int,
    theta: float,
    mrope_section: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal RoPE table merge for Qwen2.5-VL.

    position_ids: (3, B, L) — temporal / height / width position streams
    (produced by `get_rope_index`, plumbed through the reference at
    qwen_2_5_vl_sam2.py:163-167,199 via `second_per_grid_ts`/grid_thw).
    mrope_section: e.g. (16, 24, 24); sums to head_dim//2.

    Returns cos, sin of shape (B, L, head_dim) where frequency k of the half
    table is taken from stream section[k] and then duplicated rotate_half
    style — matching HF `apply_multimodal_rotary_pos_emb`'s
    `split(mrope_section * 2)` + `i % 3` chunk selection.
    """
    assert sum(mrope_section) == head_dim // 2
    inv = rope_inv_freq(head_dim, theta)  # (D/2,)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv  # (3,B,L,D/2)
    sec_id = np.concatenate(
        [np.full((n,), i, dtype=np.int32) for i, n in enumerate(mrope_section)]
    )  # (D/2,)
    merged = jnp.take_along_axis(
        jnp.moveaxis(freqs, 0, -1),  # (B, L, D/2, 3)
        jnp.asarray(sec_id)[None, None, :, None],
        axis=-1,
    )[..., 0]  # (B, L, D/2)
    emb = jnp.concatenate([merged, merged], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def vision_rope_cos_sin(
    hpos: jnp.ndarray,
    wpos: jnp.ndarray,
    head_dim: int,
    theta: float = 10_000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Qwen ViT 2D rotary table.

    hpos/wpos: (L,) patch grid coordinates (window-reordered upstream).
    Per-axis frequency count is head_dim//4; the half-table is
    [h_freqs | w_freqs], duplicated rotate_half style → (L, head_dim).
    """
    dim = head_dim // 2
    inv = rope_inv_freq(dim, theta)  # (D/4,)
    fh = hpos.astype(jnp.float32)[:, None] * inv
    fw = wpos.astype(jnp.float32)[:, None] * inv
    half = jnp.concatenate([fh, fw], axis=-1)  # (L, D/2)
    emb = jnp.concatenate([half, half], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


# ---------------------------------------------------------------------------
# SAM2 axial RoPE (interleaved complex-pair convention)
# ---------------------------------------------------------------------------


def axial_cos_sin(
    end_x: int, end_y: int, dim: int, theta: float = 10_000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2D axial rotary table for a flattened (end_x * end_y) token grid.

    Equivalent to `compute_axial_cis` (ref: model/sam2.py:1874-1896) with the
    complex `freqs_cis` expressed as separate cos/sin of shape
    (end_x*end_y, dim//2). dim is the per-head dim; half the pair-frequencies
    encode x, half encode y.
    """
    quarter = dim // 4
    freqs = 1.0 / (
        theta ** (np.arange(0, dim, 4, dtype=np.float32)[:quarter] / dim)
    )
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = t % end_x
    t_y = np.floor(t / end_x)
    fx = np.outer(t_x, freqs)  # (L, dim/4)
    fy = np.outer(t_y, freqs)
    ang = np.concatenate([fx, fy], axis=-1)  # (L, dim/2)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def apply_rotary_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate interleaved (even, odd) pairs: the JAX equivalent of
    `apply_rotary_enc`'s complex multiply (ref: model/sam2.py:1899-1924).

    x: (..., L, dim); cos/sin: (L, dim//2) (broadcast over leading axes).
    """
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    x_even = x32[..., 0::2]
    x_odd = x32[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_even * sin + x_odd * cos
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(orig)
