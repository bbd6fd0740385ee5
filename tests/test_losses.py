"""Losses vs torch reference formulas (dice scale-1000, BCE-with-logits,
HF-style shifted CE)."""
import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from rga3_tpu.ops import losses


def _torch_dice(inputs, targets, num_masks, scale=1000, eps=1e-6):
    inputs = torch.sigmoid(inputs).flatten(1, 2)
    targets = targets.flatten(1, 2)
    numerator = 2 * (inputs / scale * targets).sum(-1)
    denominator = (inputs / scale).sum(-1) + (targets / scale).sum(-1)
    loss = 1 - (numerator + eps) / (denominator + eps)
    return (loss.sum() / (num_masks + 1e-8)).item()


def _torch_bce(inputs, targets, num_masks):
    loss = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    return (loss.flatten(1, 2).mean(1).sum() / (num_masks + 1e-8)).item()


@pytest.mark.parametrize("shape", [(3, 16, 16), (1, 8, 24)])
def test_dice_loss_matches_torch(shape):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32) * 3
    t = (rng.random(shape) > 0.5).astype(np.float32)
    ref = _torch_dice(torch.tensor(x), torch.tensor(t), num_masks=shape[0])
    got = float(losses.dice_loss(jnp.asarray(x), jnp.asarray(t), shape[0]))
    assert abs(ref - got) < 1e-5


@pytest.mark.parametrize("shape", [(3, 16, 16), (2, 8, 24)])
def test_sigmoid_ce_matches_torch(shape):
    rng = np.random.default_rng(1)
    x = rng.normal(size=shape).astype(np.float32) * 3
    t = (rng.random(shape) > 0.5).astype(np.float32)
    ref = _torch_bce(torch.tensor(x), torch.tensor(t), num_masks=shape[0])
    got = float(losses.sigmoid_ce_loss(jnp.asarray(x), jnp.asarray(t), shape[0]))
    assert abs(ref - got) < 1e-5


def test_masked_losses_equal_unmasked_when_all_valid():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 8, 8)).astype(np.float32))
    t = jnp.asarray((rng.random((4, 8, 8)) > 0.5).astype(np.float32))
    valid = jnp.ones((4,), jnp.float32)
    assert np.isclose(
        float(losses.masked_dice_loss(x, t, valid)),
        float(losses.dice_loss(x, t, 4.0)),
        atol=1e-6,
    )
    assert np.isclose(
        float(losses.masked_sigmoid_ce_loss(x, t, valid)),
        float(losses.sigmoid_ce_loss(x, t, 4.0)),
        atol=1e-6,
    )


def test_masked_losses_drop_invalid_rows():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 8, 8)).astype(np.float32)
    t = (rng.random((4, 8, 8)) > 0.5).astype(np.float32)
    valid = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    got = float(losses.masked_dice_loss(jnp.asarray(x), jnp.asarray(t), valid))
    ref = float(losses.dice_loss(jnp.asarray(x[:2]), jnp.asarray(t[:2]), 2.0))
    assert abs(got - ref) < 1e-6


def test_cross_entropy_matches_torch_shifted():
    rng = np.random.default_rng(4)
    B, L, V = 2, 12, 50
    logits = rng.normal(size=(B, L, V)).astype(np.float32)
    labels = rng.integers(0, V, size=(B, L))
    labels[:, :4] = -100  # masked prompt span
    t_logits = torch.tensor(logits)[:, :-1].reshape(-1, V)
    t_labels = torch.tensor(labels)[:, 1:].reshape(-1)
    ref = F.cross_entropy(t_logits, t_labels, ignore_index=-100).item()
    got = float(
        losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    )
    assert abs(ref - got) < 1e-4
