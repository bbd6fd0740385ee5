"""SAM-v1 top-level model: ViT encoder + prompt encoder + mask decoder with
the UniGR `text_embeds` language-prompt pathway.

Reference behavior (legacy UniGR variant):
  * `text_embeds` are concatenated to the sparse prompt embeddings
    (ref: model/segment_anything/modeling/prompt_encoder.py:176-180); with
    no point/box prompts the sparse tokens are the language tokens alone.
  * The composite decodes every video frame with the same language prompt
    (ref: model/qwen_2_5_vl.py:236-268 per-frame loop) — here batched over
    frames in one jitted call, like the SAM2 path.
  * Pixel preprocessing is mean/std + bottom-right pad
    (ref: model/segment_anything/modeling/sam.py:165-178).

The prompt encoder module is shared with SAM2 (identical architecture,
ref prompt_encoder.py:16-238 == model/sam2.py:1551-1717)."""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..sam2.prompt_encoder import PromptEncoder
from .config import Sam1Config
from .decoder import Sam1MaskDecoder
from .vit import ImageEncoderViT


class Sam1Model(nn.Module):
    cfg: Sam1Config

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg, name="image_encoder")
        self.prompt_encoder = PromptEncoder(self.cfg, name="prompt_encoder")
        self.mask_decoder = Sam1MaskDecoder(self.cfg, name="mask_decoder")

    def __call__(self, images: jnp.ndarray, language_embd: jnp.ndarray):
        """Init-coverage forward: touches every submodule (incl. the
        point/mask prompt branches flax would otherwise skip)."""
        out = self.decode_frames_with_language(images, language_embd)
        self.prompt_encoder(
            point_coords=jnp.zeros((1, 1, 2), jnp.float32),
            point_labels=jnp.ones((1, 1), jnp.int32),
            masks=jnp.zeros(
                (1, 4 * self.cfg.feat_size, 4 * self.cfg.feat_size, 1)
            ),
        )
        return out

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3), already preprocessed — or uint8 at
        image_size, in which case the ImageNet normalization runs here
        on device (bit-identical to the host path; the SAM-v1
        pixel_mean/std are the same ImageNet stats). -> (B, S, S, 256).
        """
        from ...ops.resize import sam_normalize_maybe

        return self.image_encoder(sam_normalize_maybe(images))

    def decode_with_language(
        self,
        image_embeddings: jnp.ndarray,  # (B, S, S, 256)
        language_embd: jnp.ndarray,  # (B, N, 256)
        multimask_output: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Language-only prompting: sparse tokens = text embeddings, dense =
        no-mask embedding (ref prompt_encoder.py:167-183 with points=None,
        the model_forward call at model/qwen_2_5_vl.py:238-247)."""
        b = image_embeddings.shape[0]
        s = self.cfg.feat_size
        dense = jnp.broadcast_to(
            self.prompt_encoder.no_mask_embed.embedding[0][None, None, None],
            (b, s, s, self.cfg.d_model),
        )
        image_pe = self.prompt_encoder.dense_pe()
        masks, iou = self.mask_decoder(
            image_embeddings, image_pe,
            language_embd.astype(image_embeddings.dtype), dense,
            multimask_output=multimask_output,
        )
        return {"low_res_masks": masks, "iou_predictions": iou}

    def decode_with_prompts(
        self,
        image_embeddings: jnp.ndarray,
        point_coords: Optional[jnp.ndarray] = None,  # (B, P, 2) pixels
        point_labels: Optional[jnp.ndarray] = None,  # (B, P)
        masks: Optional[jnp.ndarray] = None,  # (B, 4S, 4S, 1)
        multimask_output: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Point/box/mask prompting (SamPredictor-equivalent; boxes are the
        two corner points with labels 2/3, ref prompt_encoder.py:100-109)."""
        sparse, dense = self.prompt_encoder(
            point_coords=point_coords, point_labels=point_labels, masks=masks,
            batch=image_embeddings.shape[0],
        )
        image_pe = self.prompt_encoder.dense_pe()
        out_masks, iou = self.mask_decoder(
            image_embeddings, image_pe,
            sparse.astype(image_embeddings.dtype),
            dense.astype(image_embeddings.dtype),
            multimask_output=multimask_output,
        )
        return {"low_res_masks": out_masks, "iou_predictions": iou}

    def decode_frames_with_language(
        self,
        frames: jnp.ndarray,  # (T, H, W, 3) preprocessed
        language_embd: jnp.ndarray,  # (T, N, 256)
        multimask_output: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Batched over frames — the reference's per-frame Python loop
        (model/qwen_2_5_vl.py:249-268) as one call."""
        emb = self.encode_image(frames)
        return self.decode_with_language(
            emb, language_embd, multimask_output=multimask_output
        )

    def preprocess(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., H, W, 3) raw pixels -> normalized, padded to image_size
        (ref sam.py:165-178)."""
        mean = jnp.asarray(self.cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(self.cfg.pixel_std, jnp.float32)
        x = (x.astype(jnp.float32) - mean) / std
        h, w = x.shape[-3:-1]
        size = self.cfg.image_size
        pad = [(0, 0)] * (x.ndim - 3) + [
            (0, size - h), (0, size - w), (0, 0),
        ]
        return jnp.pad(x, pad)
