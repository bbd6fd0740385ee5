"""SAM-v1 ViT image encoder (ViTDet-style, decomposed relative positions).

TPU-native rebuild of the reference encoder
(ref: model/segment_anything/modeling/image_encoder.py:17-426 —
ImageEncoderViT / Block / Attention / window_partition / rel-pos). NHWC
throughout; windows are static reshapes so XLA sees fixed shapes. Global
blocks scan over the batch to bound the f32 score memory at 4096 tokens.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..sam2.layers import ChannelLayerNorm, LayerNorm
from .config import Sam1Config


def window_partition(
    x: jnp.ndarray, ws: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, ws, ws, C) with zero padding
    (ref image_encoder.py:267-293)."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(
    wins: jnp.ndarray, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of window_partition, cropping the padding
    (ref image_encoder.py:296-318)."""
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // ws // ws)
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos_table(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """(2*size-1, hd) table gathered into (size, size) relative offsets for
    q_size == k_size (ref get_rel_pos :321-352; the interpolation branch
    never triggers because our param is created at the exact length)."""
    coords = (
        jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
    )
    return rel_pos[coords]  # (size, size, hd)


def add_decomposed_rel_pos(
    attn: jnp.ndarray,  # (B, nH, q_h*q_w, k_h*k_w) f32
    q: jnp.ndarray,  # (B, nH, q_h*q_w, hd)
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    size: int,
) -> jnp.ndarray:
    """MViTv2 decomposed relative position bias (ref :355-396), with
    q_size == k_size == (size, size)."""
    rh = _rel_pos_table(rel_pos_h, size)  # (S, S, hd)
    rw = _rel_pos_table(rel_pos_w, size)
    b, nh = q.shape[:2]
    rq = q.reshape(b, nh, size, size, -1).astype(jnp.float32)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, rh.astype(jnp.float32))
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, rw.astype(jnp.float32))
    attn = attn.reshape(b, nh, size, size, size, size)
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(b, nh, size * size, size * size)


class Sam1Attention(nn.Module):
    """Multi-head attention with decomposed rel-pos
    (ref Attention :197-260). Input (B, S, S, C), square token grids only
    (all SAM-v1 call sites are square)."""

    cfg: Sam1Config
    input_size: int  # token grid side (window or full grid)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, s, _, c = x.shape
        nh, hd = cfg.num_heads, c // cfg.num_heads
        scale = hd ** -0.5
        rel_pos_h = self.param(
            "rel_pos_h", nn.initializers.zeros, (2 * self.input_size - 1, hd)
        )
        rel_pos_w = self.param(
            "rel_pos_w", nn.initializers.zeros, (2 * self.input_size - 1, hd)
        )
        qkv = nn.Dense(3 * c, name="qkv")(x.reshape(b, s * s, c))
        qkv = qkv.reshape(b, s * s, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nH, L, hd)

        def head_attn(q, k, v):
            attn = jnp.einsum(
                "bnlc,bnmc->bnlm", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            attn = add_decomposed_rel_pos(
                attn, q, rel_pos_h, rel_pos_w, s
            )
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            return jnp.einsum("bnlm,bnmc->bnlc", attn, v)

        if s * s >= 1024 and b > 1:
            # global blocks: scan over batch to bound f32 score memory
            # (16 heads x 4096^2 f32 = ~1 GB per frame)
            out = jax.lax.map(
                lambda args: head_attn(
                    args[0][None], args[1][None], args[2][None]
                )[0],
                (q, k, v),
            )
        else:
            out = head_attn(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, s, c)
        return nn.Dense(c, name="proj")(out)


class Sam1Block(nn.Module):
    """Transformer block with windowed or global attention
    (ref Block :128-194)."""

    cfg: Sam1Config
    window_size: int  # 0 => global

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        shortcut = x
        x = LayerNorm(eps=cfg.ln_eps, name="norm1")(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
            size = self.window_size
        else:
            size = x.shape[1]
        x = Sam1Attention(cfg, input_size=size, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = LayerNorm(eps=cfg.ln_eps, name="norm2")(x)
        hdim = int(x.shape[-1] * cfg.mlp_ratio)
        y = nn.Dense(hdim, name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(x.shape[-1], name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """Full SAM-v1 encoder: patch embed + abs pos + blocks + conv neck
    (ref ImageEncoderViT :17-125). Returns (B, S, S, d_model) NHWC."""

    cfg: Sam1Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), name="patch_embed_proj",
        )(x)
        g = cfg.grid_size
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, g, g, cfg.embed_dim)
        )
        x = x + pos.astype(x.dtype)
        for i in range(cfg.depth):
            ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = Sam1Block(cfg, window_size=ws, name=f"blocks_{i}")(x)
        x = nn.Conv(cfg.d_model, (1, 1), use_bias=False, name="neck_0")(x)
        x = ChannelLayerNorm(name="neck_1")(x)
        x = nn.Conv(
            cfg.d_model, (3, 3), padding=1, use_bias=False, name="neck_2"
        )(x)
        return ChannelLayerNorm(name="neck_3")(x)
