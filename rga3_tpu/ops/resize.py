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


def _cubic_conv_weights(n_in: int, n_out: int, a: float = -0.75):
    """Dense (n_out, n_in) cubic-convolution interpolation matrix with
    torch's kernel (a=-0.75, half-pixel centers, border replication).

    jax.image.resize('bicubic') uses the Keys kernel a=-0.5, so the SAM2
    pos-embed interpolation would deviate from the checkpoint's
    F.interpolate behavior without this."""
    import numpy as np

    scale = n_in / n_out
    dst = np.arange(n_out)
    src = (dst + 0.5) * scale - 0.5
    f = np.floor(src)
    w = np.zeros((n_out, n_in), np.float32)

    def kernel(t):
        at = np.abs(t)
        return np.where(
            at <= 1,
            (a + 2) * at**3 - (a + 3) * at**2 + 1,
            np.where(
                at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0
            ),
        )

    for m in (-1, 0, 1, 2):
        idx = np.clip(f + m, 0, n_in - 1).astype(int)
        np.add.at(w, (dst, idx), kernel(src - (f + m)).astype(np.float32))
    return w


def resize_bicubic_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize of the trailing two spatial dims matching torch
    `F.interpolate(mode='bicubic', align_corners=False)` exactly
    (separable dense contraction; shapes are static so the weight
    matrices fold into the compiled graph).

    x: (..., H, W) -> (..., size[0], size[1])."""
    h, w = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(_cubic_conv_weights(h, size[0]))
    ww = jnp.asarray(_cubic_conv_weights(w, size[1]))
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,...ow->...op", ww, y)
    return y.astype(x.dtype)


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


def sam_normalize_maybe(images: jnp.ndarray) -> jnp.ndarray:
    """UINT8 frames -> ImageNet-normalized f32 on device; float frames
    pass through untouched (already normalized host-side).

    This is the bit-exact half of the device-preprocess story: the data
    layer resizes on the host (PIL semantics pinned) but ships the
    integer-valued uint8 result, and the SAM entry points replay
    `(x - mean) / std` in the same f32 ops the host path used — 4x
    fewer host->device bytes with identical numerics."""
    if images.dtype == jnp.uint8:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        return (images.astype(jnp.float32) - mean) / std
    # Float input must ALREADY be ImageNet-normalized (|x| <~ 3).
    # Raw 0-255 floats reaching here is always a caller bug (e.g. a
    # host-side astype(float32) on uint8 frames) — fail loudly under
    # eager/debug instead of silently training on garbage.
    if not isinstance(images, jax.core.Tracer):
        amax = float(jnp.max(jnp.abs(images.astype(jnp.float32))))
        if amax > 16.0:
            raise ValueError(
                "sam_normalize_maybe: float input with |x| max "
                f"{amax:.1f} — looks like raw pixels, not "
                "ImageNet-normalized frames. Ship uint8 (preferred) or "
                "normalize on host first."
            )
    return images


def sam_preprocess_frames_device(
    frames_u8: jnp.ndarray, size: int = 1024
) -> jnp.ndarray:
    """Device-side equivalent of data.datasets.base.sam_preprocess_frame:
    (T, H, W, 3) uint8 -> (T, size, size, 3) float32, DirectResize +
    ImageNet stats. jax.image.resize(cubic, antialias) stands in for the
    host path's PIL bicubic (~0.4/255 mean abs pixel deviation); shipping
    uint8 at native resolution cuts host->device bytes ~10x vs resized
    bf16 and moves the resize onto the chip."""
    t = frames_u8.shape[0]
    x = frames_u8.astype(jnp.float32)
    x = jax.image.resize(
        x, (t, size, size, 3), method="cubic", antialias=True
    )
    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)
    return (x - mean) / std
