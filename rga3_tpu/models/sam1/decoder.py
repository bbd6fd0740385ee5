"""SAM-v1 mask decoder (ref: model/segment_anything/modeling/
mask_decoder.py:16-168). Structurally the SAM2 decoder minus the
object-score token, high-res skip features and stability fallback; the
two-way transformer is the shared module (identical architecture,
ref transformer.py:12-242 == model/sam2.py:1246-1418)."""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..sam2.layers import ChannelLayerNorm, MLP
from ..sam2.mask_decoder import TwoWayTransformer
from .config import Sam1Config


class Sam1MaskDecoder(nn.Module):
    cfg: Sam1Config

    def setup(self):
        cfg = self.cfg
        d = cfg.d_model
        self.num_mask_tokens = cfg.num_multimask_outputs + 1
        self.iou_token = nn.Embed(1, d, name="iou_token")
        self.mask_tokens = nn.Embed(
            self.num_mask_tokens, d, name="mask_tokens"
        )
        self.transformer = TwoWayTransformer(cfg, name="transformer")
        self.upscale_conv1 = nn.ConvTranspose(
            d // 4, (2, 2), strides=(2, 2), name="output_upscaling_0"
        )
        self.upscale_ln = ChannelLayerNorm(name="output_upscaling_1")
        self.upscale_conv2 = nn.ConvTranspose(
            d // 8, (2, 2), strides=(2, 2), name="output_upscaling_3"
        )
        self.hyper_mlps = [
            MLP(d, d // 8, 3, name=f"output_hypernetworks_mlps_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_head = MLP(
            cfg.iou_head_hidden, self.num_mask_tokens, cfg.iou_head_depth,
            sigmoid_output=cfg.iou_prediction_use_sigmoid,
            name="iou_prediction_head",
        )

    def predict(
        self,
        image_embeddings: jnp.ndarray,  # (B, S, S, C)
        image_pe: jnp.ndarray,  # (S, S, C)
        sparse_prompt: jnp.ndarray,  # (B, N, C)
        dense_prompt: jnp.ndarray,  # (B, S, S, C)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """All 4 mask logits (B, M, 4S, 4S) + iou predictions (B, M)
        (ref predict_masks :117-168)."""
        b = sparse_prompt.shape[0]
        output_tokens = jnp.concatenate(
            [self.iou_token.embedding, self.mask_tokens.embedding], axis=0
        )
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(
                    output_tokens[None], (b, *output_tokens.shape)
                ).astype(sparse_prompt.dtype),
                sparse_prompt,
            ],
            axis=1,
        )
        src = image_embeddings + dense_prompt
        pos = jnp.broadcast_to(image_pe[None], src.shape).astype(src.dtype)
        hs, keys = self.transformer(src, pos, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens]

        h, w = src.shape[1:3]
        up = self.upscale_conv1(keys.reshape(b, h, w, -1))
        up = nn.gelu(self.upscale_ln(up), approximate=False)
        up = nn.gelu(self.upscale_conv2(up), approximate=False)

        hyper = jnp.stack(
            [
                self.hyper_mlps[i](mask_tokens_out[:, i])
                for i in range(self.num_mask_tokens)
            ],
            axis=1,
        )  # (B, M, C/8)
        masks = jnp.einsum(
            "bmc,bhwc->bmhw", hyper, up, preferred_element_type=jnp.float32
        )
        iou_pred = self.iou_head(iou_token_out)
        return masks, iou_pred

    def __call__(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt,
        dense_prompt,
        multimask_output: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        masks, iou_pred = self.predict(
            image_embeddings, image_pe, sparse_prompt, dense_prompt
        )
        if multimask_output:  # ref forward :104-113
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, 0:1], iou_pred[:, 0:1]
