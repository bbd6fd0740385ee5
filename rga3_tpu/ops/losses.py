"""Segmentation losses.

Numerically equivalent to the reference implementations
(ref: model/qwen_2_5_vl_sam2.py:17-60 — dice_loss with scale=1000,
sigmoid_ce_loss) but written as pure functions over static-shape batches with
explicit validity weights instead of Python loops over ragged per-sample
lists (ref loops at qwen_2_5_vl_sam2.py:283-306). That makes them jittable
and shardable over a data mesh axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    num_masks: float | jnp.ndarray,
    scale: float = 1000.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """DICE loss over logits.

    inputs:  (N, H, W) mask logits.
    targets: (N, H, W) binary ground truth.
    num_masks: normalizer (sum of valid masks).
    """
    probs = jax.nn.sigmoid(inputs.astype(jnp.float32))
    probs = probs.reshape(probs.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    numerator = 2.0 * jnp.sum(probs / scale * t, axis=-1)
    denominator = jnp.sum(probs / scale, axis=-1) + jnp.sum(t / scale, axis=-1)
    loss = 1.0 - (numerator + eps) / (denominator + eps)
    return jnp.sum(loss) / (num_masks + 1e-8)


def sigmoid_ce_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    num_masks: float | jnp.ndarray,
) -> jnp.ndarray:
    """Per-pixel binary cross entropy with logits, mean over pixels,
    sum over masks, normalized by num_masks."""
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # log(1+exp(-|x|)) + max(x,0) - x*t  (stable BCE-with-logits)
    per_pixel = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per_mask = per_pixel.reshape(per_pixel.shape[0], -1).mean(axis=-1)
    return jnp.sum(per_mask) / (num_masks + 1e-8)


def masked_dice_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    valid: jnp.ndarray,
    scale: float = 1000.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Batched dice with a (N,) validity mask; invalid rows contribute 0.

    Equivalent to the reference's `pred_mask[0:0]` skip for samples without a
    [SEG] token (ref: qwen_2_5_vl_sam2.py:289-291) but static-shape.
    """
    probs = jax.nn.sigmoid(inputs.astype(jnp.float32))
    probs = probs.reshape(probs.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    numerator = 2.0 * jnp.sum(probs / scale * t, axis=-1)
    denominator = jnp.sum(probs / scale, axis=-1) + jnp.sum(t / scale, axis=-1)
    loss = (1.0 - (numerator + eps) / (denominator + eps)) * valid
    return jnp.sum(loss) / (jnp.sum(valid) + 1e-8)


def masked_sigmoid_ce_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    per_pixel = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per_mask = per_pixel.reshape(per_pixel.shape[0], -1).mean(axis=-1)
    return jnp.sum(per_mask * valid) / (jnp.sum(valid) + 1e-8)


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = -100,
) -> jnp.ndarray:
    """Next-token CE with label shift, matching HF causal-LM loss semantics
    (the `ce_loss` term at ref qwen_2_5_vl_sam2.py:205-207).

    logits: (B, L, V); labels: (B, L) with ignore_index masking.
    """
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = (shift_labels != ignore_index).astype(jnp.float32)
    safe_labels = jnp.where(shift_labels == ignore_index, 0, shift_labels)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    gold = jnp.take_along_axis(
        shift_logits, safe_labels[..., None], axis=-1
    ).squeeze(-1)
    nll = (logz - gold) * valid
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1.0)
