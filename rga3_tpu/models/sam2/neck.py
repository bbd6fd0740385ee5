"""FPN neck + sine position encodings for the SAM2 image encoder
(ref: model/sam2.py:770-889 — ImageEncoder, FpnNeck, PositionEmbeddingSine;
build constants :165-195: d_model 256, channels [1152,576,288,144],
top-down levels [2,3], nearest interpolation, scalp=1)."""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .config import Sam2Config
from .layers import sine_position_encoding


class FpnNeck(nn.Module):
    cfg: Sam2Config

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]):
        """xs: trunk outputs, HIGHEST resolution first (stride 4..32).
        Returns (features, pos) lists in the same order, all d_model chans.

        Note: reference conv index n-i pairs conv_0 with the LOWEST
        resolution input (backbone_channel_list is [1152,576,288,144])."""
        cfg = self.cfg
        n = len(xs) - 1
        out: List[jnp.ndarray] = [None] * len(xs)
        pos: List[jnp.ndarray] = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):  # low resolution -> high resolution
            lateral = nn.Conv(
                cfg.d_model, (1, 1), name=f"convs_{n - i}_conv"
            )(xs[i])
            if i in cfg.fpn_top_down_levels and prev is not None:
                b, h, w, c = prev.shape
                top_down = jnp.repeat(
                    jnp.repeat(prev.astype(jnp.float32), 2, axis=1), 2, axis=2
                )  # nearest 2x upsample
                prev = lateral + top_down.astype(lateral.dtype)
            else:
                prev = lateral
            out[i] = prev
            h, w = prev.shape[1:3]
            pe = sine_position_encoding(h, w, cfg.d_model)
            pos[i] = jnp.broadcast_to(
                pe[None], (prev.shape[0], h, w, cfg.d_model)
            ).astype(prev.dtype)
        return out, pos


class ImageEncoder(nn.Module):
    """Hiera trunk + FPN neck; drops `scalp` lowest-res levels
    (ref ImageEncoder :770-798)."""

    cfg: Sam2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from .hiera import Hiera

        feats = Hiera(self.cfg.hiera, name="trunk")(x)
        features, pos = FpnNeck(self.cfg, name="neck")(feats)
        if self.cfg.scalp > 0:
            features = features[: -self.cfg.scalp]
            pos = pos[: -self.cfg.scalp]
        return {
            "backbone_fpn": features,  # stride 4, 8, 16 (high->low res)
            "vision_pos_enc": pos,
        }
