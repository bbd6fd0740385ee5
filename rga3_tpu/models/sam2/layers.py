"""Shared SAM2 building blocks (NHWC, flax.linen).

JAX equivalents of the reference's torch layers (ref: model/sam2.py —
LayerNorm2d :2318-2332, MLP :2305-2316, Attention :1419-1483,
PositionEmbeddingSine :1718-1791, PositionEmbeddingRandom :1817-1872).
Everything runs NHWC (TPU-native conv layout); the checkpoint loader
transposes torch OIHW weights.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import flash_attention, mha_reference


def attend(q, k, v, *, min_flash_len: int = 1024):
    """(B, L, H, D) attention; flash kernel for long sequences on TPU."""
    if q.shape[1] >= min_flash_len and jax.default_backend() == "tpu":
        return flash_attention(q, k, v)
    return mha_reference(q, k, v)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last, NHWC) dim with weight+bias —
    equivalent to the reference's LayerNorm2d on NCHW."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        out = (x32 - mu) / jnp.sqrt(var + self.eps) * w + b
        return out.astype(x.dtype)


class LayerNorm(nn.Module):
    """Standard LayerNorm (eps 1e-5 default, like torch nn.LayerNorm)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        out = (x32 - mu) / jnp.sqrt(var + self.eps) * w + b
        return out.astype(x.dtype)


class MLP(nn.Module):
    """num_layers-deep MLP with act between layers (ref MLP :2305-2316)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    activation: str = "relu"
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]
        for i in range(self.num_layers):
            out_d = (
                self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            )
            x_new = nn.Dense(out_d, name=f"layers_{i}")(x)
            x = x_new if i == self.num_layers - 1 else act(x_new)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class SamAttention(nn.Module):
    """Projection attention with optional internal downsampling
    (ref Attention :1419-1483)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        h = self.num_heads
        q = nn.Dense(internal, name="q_proj")(q)
        k = nn.Dense(internal, name="k_proj")(k)
        v = nn.Dense(internal, name="v_proj")(v)
        b, lq, _ = q.shape
        lk = k.shape[1]
        qh = q.reshape(b, lq, h, internal // h)
        kh = k.reshape(b, lk, h, internal // h)
        vh = v.reshape(b, lk, h, internal // h)
        out = attend(qh, kh, vh).reshape(b, lq, internal)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


def sine_position_encoding(
    h: int, w: int, num_pos_feats: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """PositionEmbeddingSine with normalize=True, scale=2π
    (ref :1718-1791). Returns (H, W, num_pos_feats) with [y | x] order."""
    half = num_pos_feats // 2
    scale = 2 * math.pi
    eps = 1e-6
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(half, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = np.stack(
        [np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3
    ).reshape(h, w, -1)
    pos_y = np.stack(
        [np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3
    ).reshape(h, w, -1)
    return jnp.asarray(np.concatenate([pos_y, pos_x], axis=-1))


def get_1d_sine_pe(pos: jnp.ndarray, dim: int, temperature=10000.0):
    """(N,) positions -> (N, dim) [sin | cos] (ref get_1d_sine_pe :2291-2301)."""
    half = dim // 2
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pe = pos.astype(jnp.float32)[:, None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


class PositionEmbeddingRandom(nn.Module):
    """Gaussian random-frequency PE (ref :1817-1872). The gaussian matrix is
    a checkpoint buffer, stored here as a frozen param."""

    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords normalized to [0,1], (..., 2) -> (..., 2*num_pos_feats)."""
        mat = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, self.num_pos_feats),
        )
        c = 2 * coords.astype(jnp.float32) - 1
        c = c @ mat
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid_pe(self, h: int, w: int) -> jnp.ndarray:
        """Dense grid PE: (H, W, C) with pixel-center coords."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [
                jnp.broadcast_to(xs[None, :], (h, w)),
                jnp.broadcast_to(ys[:, None], (h, w)),
            ],
            axis=-1,
        )
        return self(grid)
