"""Image resizing + normalization primitives.

Replaces the reference's torch `F.interpolate(mode='bilinear',
align_corners=False)` (ref: qwen_2_5_vl_sam2.py:63-77 postprocess_masks,
:244/:273 per-sample resizes) and the host-side SAM preprocessing
(ImageNet normalize + pad to 1024², ref: utils/utils.py:232-258). All
functions are jittable; `jax.image.resize(method='bilinear')` uses
half-pixel centers, which is exactly torch's align_corners=False.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of the trailing two spatial dims (align_corners=False).

    x: (..., H, W) -> (..., size[0], size[1])."""
    out_shape = x.shape[:-2] + tuple(size)
    # antialias=False: torch F.interpolate does not low-pass when
    # downscaling, and mask post-processing must match it exactly.
    return jax.image.resize(
        x.astype(jnp.float32), out_shape, method="bilinear", antialias=False
    ).astype(x.dtype)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    out_shape = x.shape[:-2] + tuple(size)
    return jax.image.resize(x, out_shape, method="nearest")


def sam_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-stat normalization of (..., 3, H, W) uint8/float pixels
    (ref: utils/utils.py:232-246 `preprocess`)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(3, 1, 1)
    return (x.astype(jnp.float32) - mean) / std


def sam_preprocess(
    x: jnp.ndarray, img_size: int = 1024
) -> jnp.ndarray:
    """Normalize + pad bottom/right to (3, img_size, img_size)
    (ref: utils/utils.py:232-246)."""
    x = sam_normalize(x)
    h, w = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [(0, img_size - h), (0, img_size - w)]
    return jnp.pad(x, pad)


def postprocess_masks(
    masks: jnp.ndarray,
    input_size: Tuple[int, int],
    original_size: Tuple[int, int],
    sam_size: int = 1024,
) -> jnp.ndarray:
    """Upscale decoder masks to 1024², crop the valid (unpadded) region,
    and resize to the original frame size
    (ref: qwen_2_5_vl_sam2.py:63-77)."""
    masks = resize_bilinear(masks, (sam_size, sam_size))
    masks = masks[..., : input_size[0], : input_size[1]]
    return resize_bilinear(masks, tuple(original_size))
