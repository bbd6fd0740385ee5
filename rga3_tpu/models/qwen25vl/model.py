"""Qwen2.5-VL composite model: vision tower + decoder LM.

Vision tokens are scattered into the text embedding sequence at
<|image_pad|>/<|video_pad|> positions — the JAX (static-shape) equivalent of
HF's `masked_scatter` merge that the reference drives through
`super().forward(...)` (ref: qwen_2_5_vl_sam2.py:182-200).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .config import Qwen25VLConfig
from .language import QwenForCausalLM
from .vision import QwenVisionTower


def scatter_vision_tokens(
    embeds: jnp.ndarray,  # (B, L, D) text embeddings
    input_ids: jnp.ndarray,  # (B, L)
    vision_embeds: jnp.ndarray,  # (N, D) merged vision tokens, natural order
    image_token_id: int,
    video_token_id: int,
) -> jnp.ndarray:
    """Replace vision-pad token embeddings with vision tower outputs.

    Vision tokens appear in the sequence in the same order the tower emits
    them (batch-major). Static-shape: a cumulative-count gather, no boolean
    indexing.
    """
    mask = (input_ids == image_token_id) | (input_ids == video_token_id)
    flat_mask = mask.reshape(-1)
    idx = jnp.cumsum(flat_mask) - 1  # position within vision_embeds
    idx = jnp.clip(idx, 0, vision_embeds.shape[0] - 1)
    gathered = vision_embeds[idx].reshape(embeds.shape)
    return jnp.where(mask[..., None], gathered.astype(embeds.dtype), embeds)


class Qwen25VL(nn.Module):
    """Full VLM. Vision inputs are optional (text-only path for decode)."""

    cfg: Qwen25VLConfig
    remat: Any = False  # False | True | "full" | "dots" | "none"

    def setup(self):
        self.visual = QwenVisionTower(self.cfg.vision, name="visual")
        self.lm = QwenForCausalLM(
            self.cfg.text, remat=self.remat, name="lm"
        )

    def encode_vision(
        self, pixel_patches: jnp.ndarray, layout_args: Dict[str, Any],
        compute_dtype=jnp.float32,
    ) -> jnp.ndarray:
        return self.visual(
            pixel_patches, compute_dtype=compute_dtype, **layout_args
        )

    def __call__(
        self,
        input_ids: jnp.ndarray,
        position_ids: Optional[jnp.ndarray] = None,  # (3, B, L)
        segment_ids: Optional[jnp.ndarray] = None,
        pixel_patches: Optional[jnp.ndarray] = None,
        vision_layout: Optional[Dict[str, Any]] = None,
        cache: Optional[Dict[str, Any]] = None,
        compute_dtype=jnp.float32,
        logits_indices: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        embeds = self.lm.embed(input_ids)
        if pixel_patches is not None:
            vis = self.encode_vision(
                pixel_patches, vision_layout, compute_dtype
            )
            embeds = scatter_vision_tokens(
                embeds, input_ids, vis,
                self.cfg.image_token_id, self.cfg.video_token_id,
            )
        return self.lm(
            inputs_embeds=embeds,
            position_ids=position_ids,
            segment_ids=segment_ids,
            cache=cache,
            compute_dtype=compute_dtype,
            logits_indices=logits_indices,
        )
