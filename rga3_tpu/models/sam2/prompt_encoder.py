"""SAM2 prompt encoder (ref: model/sam2.py:1551-1717).

Point/box/mask prompts -> sparse (B, N, 256) + dense (B, H, W, 256)
embeddings. Static-shape friendly: points are always a fixed-size array with
label -1 padding (the reference pads the same way at :2637-2639)."""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .config import Sam2Config
from .layers import ChannelLayerNorm, PositionEmbeddingRandom


class PromptEncoder(nn.Module):
    cfg: Sam2Config

    def setup(self):
        d = self.cfg.d_model
        self.pe_layer = PositionEmbeddingRandom(d // 2, name="pe_layer")
        # 4 point embeddings: neg, pos, box tl, box br (ref :1580-1585)
        self.point_embeddings = [
            nn.Embed(1, d, name=f"point_embeddings_{i}") for i in range(4)
        ]
        self.not_a_point_embed = nn.Embed(1, d, name="not_a_point_embed")
        self.no_mask_embed = nn.Embed(1, d, name="no_mask_embed")
        # mask downscaling: 2 conv-stride-2 stages + 1x1 (ref :1590-1599)
        mask_chans = 16
        self.mask_conv1 = nn.Conv(
            mask_chans // 4, (2, 2), strides=(2, 2), name="mask_downscaling_0"
        )
        self.mask_ln1 = ChannelLayerNorm(name="mask_downscaling_1")
        self.mask_conv2 = nn.Conv(
            mask_chans, (2, 2), strides=(2, 2), name="mask_downscaling_3"
        )
        self.mask_ln2 = ChannelLayerNorm(name="mask_downscaling_4")
        self.mask_conv3 = nn.Conv(d, (1, 1), name="mask_downscaling_6")

    def dense_pe(self) -> jnp.ndarray:
        """(H, W, d) positional grid for the mask decoder."""
        s = self.cfg.feat_size
        return self.pe_layer.grid_pe(s, s)

    def embed_points(
        self, coords: jnp.ndarray, labels: jnp.ndarray
    ) -> jnp.ndarray:
        """coords (B, P, 2) pixel units; labels (B, P) in {-1,0,1,2,3}.
        Pads one extra (0,0)/-1 point, matching `pad=True` (ref :1618-1624).
        """
        b, p, _ = coords.shape
        coords = jnp.concatenate(
            [coords, jnp.zeros((b, 1, 2), coords.dtype)], axis=1
        )
        labels = jnp.concatenate(
            [labels, -jnp.ones((b, 1), labels.dtype)], axis=1
        )
        size = self.cfg.image_size
        normed = (coords + 0.5) / size
        pe = self.pe_layer(normed)
        out = jnp.where(labels[..., None] == -1, 0.0, pe)
        out = out + jnp.where(
            labels[..., None] == -1, self.not_a_point_embed.embedding[0], 0.0
        )
        for i in range(4):
            out = out + jnp.where(
                labels[..., None] == i, self.point_embeddings[i].embedding[0],
                0.0,
            )
        return out

    def embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """(B, 4s, 4s, 1) mask prompt -> (B, s, s, d)."""
        x = nn.gelu(self.mask_ln1(self.mask_conv1(masks)), approximate=False)
        x = nn.gelu(self.mask_ln2(self.mask_conv2(x)), approximate=False)
        return self.mask_conv3(x)

    def __call__(
        self,
        point_coords: Optional[jnp.ndarray] = None,
        point_labels: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
        batch: int = 1,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if point_coords is None:
            point_coords = jnp.zeros((batch, 1, 2), jnp.float32)
            point_labels = -jnp.ones((batch, 1), jnp.int32)
        sparse = self.embed_points(point_coords, point_labels)
        s = self.cfg.feat_size
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed.embedding[0][None, None, None],
                (sparse.shape[0], s, s, self.cfg.d_model),
            )
        return sparse, dense
