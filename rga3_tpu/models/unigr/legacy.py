"""Legacy UniGR variant: Qwen2.5-VL + [SEG] projection + SAM-v1 (ViT-H).

JAX rebuild of the reference's legacy composite
(ref: model/qwen_2_5_vl.py:72-412 — UniGRConfig/UniGRModel on
`build_sam_vit_h`). Same [SEG] recipe as the SAM2 variant
(models/unigr/model.py) but the grounding backbone is SAM-v1: per-frame
mask decoding from a shared text prompt, no video memory. Differences from
the reference preserved here:
  * the [SEG] hidden state is gathered shifted left by one
    (ref :210-212), projected by `text_hidden_fcs` (ref :118-131);
  * the text embedding prompts EVERY frame's decoder with
    `multimask_output=False` (ref :236-268) — batched over frames here
    instead of the reference's per-frame Python loop;
  * losses: weighted ce + bce + dice (scale-1000) over per-frame masks
    (ref :26-69, :280-315).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ...config import ConfigBase, SegHeadConfig
from ...ops import losses as loss_ops
from ...ops.resize import resize_bilinear
from ...ops.seg_gather import gather_seg_embeddings
from ..qwen25vl.config import Qwen25VLConfig
from ..qwen25vl.model import Qwen25VL
from ..sam1.config import Sam1Config
from ..sam1.model import Sam1Model
from .model import SegProjection


@dataclass(frozen=True)
class UniGRLegacyConfig(ConfigBase):
    qwen: Qwen25VLConfig = field(default_factory=Qwen25VLConfig)
    sam1: Sam1Config = field(default_factory=Sam1Config)
    seg: SegHeadConfig = field(default_factory=SegHeadConfig)


class UniGRLegacy(nn.Module):
    cfg: UniGRLegacyConfig
    remat: bool = False

    def setup(self):
        self.qwen = Qwen25VL(self.cfg.qwen, remat=self.remat, name="qwen")
        self.sam_model = Sam1Model(self.cfg.sam1, name="sam_model")
        self.text_hidden_fcs = SegProjection(
            self.cfg.seg.out_dim, name="text_hidden_fcs"
        )

    def __call__(self, images, language_embd, input_ids):
        """Init-coverage forward (mirrors UniGR.__call__)."""
        from ..qwen25vl.vision import (
            compute_vision_layout, layout_device_args,
        )

        vcfg = self.cfg.qwen.vision
        layout = compute_vision_layout([(1, 2, 2)], vcfg)
        la = layout_device_args(layout, vcfg)
        patches = jnp.zeros(
            (4, 3 * vcfg.temporal_patch_size * vcfg.patch_size**2),
            jnp.float32,
        )
        out = self.qwen(
            input_ids=input_ids, pixel_patches=patches, vision_layout=la
        )
        self.text_hidden_fcs(out["hidden_states"])
        return self.sam_model(images, language_embd)

    def _seg_embeddings(self, hidden, token_ids):
        projected = self.text_hidden_fcs(hidden)
        return gather_seg_embeddings(
            projected, token_ids, self.cfg.seg.seg_token_id
        )

    def train_forward(
        self,
        input_ids: jnp.ndarray,  # (B, L)
        labels: jnp.ndarray,  # (B, L), -100 masked
        position_ids: jnp.ndarray,  # (3, B, L)
        segment_ids: Optional[jnp.ndarray],
        images_sam: jnp.ndarray,  # (B, T, H, W, 3) preprocessed
        gt_masks: jnp.ndarray,  # (B, T, H, W)
        masks_valid: jnp.ndarray,  # (B,)
        pixel_patches: Optional[jnp.ndarray] = None,
        vision_layout: Optional[Dict[str, Any]] = None,
        compute_dtype=jnp.bfloat16,
    ) -> Dict[str, jnp.ndarray]:
        """ref model_forward training branch (:180-315), static shapes."""
        cfg = self.cfg.seg
        b, t = images_sam.shape[:2]

        out = self.qwen(
            input_ids=input_ids,
            position_ids=position_ids,
            segment_ids=segment_ids,
            pixel_patches=pixel_patches,
            vision_layout=vision_layout,
            compute_dtype=compute_dtype,
        )
        ce_loss = loss_ops.cross_entropy_loss(out["logits"], labels)
        ce_loss = ce_loss * cfg.ce_loss_weight

        seg_emb, has_seg = self._seg_embeddings(out["hidden_states"], labels)
        lang = jnp.broadcast_to(
            seg_emb[:, None, :], (b, t, cfg.out_dim)
        ).reshape(b * t, 1, cfg.out_dim)

        frames = images_sam.reshape(b * t, *images_sam.shape[2:])
        sam_out = self.sam_model.decode_frames_with_language(
            frames, lang, multimask_output=False
        )
        low_res = sam_out["low_res_masks"][:, 0]  # (B*T, 4S, 4S)
        size = gt_masks.shape[-2:]
        pred = resize_bilinear(low_res, size)

        valid = has_seg.astype(jnp.float32) * masks_valid.astype(jnp.float32)
        valid_bt = jnp.repeat(valid, t)
        gt_flat = gt_masks.reshape(b * t, *size)
        mask_bce = loss_ops.masked_sigmoid_ce_loss(
            pred, gt_flat, valid_bt
        ) * cfg.bce_loss_weight
        mask_dice = loss_ops.masked_dice_loss(
            pred, gt_flat, valid_bt, scale=cfg.dice_scale
        ) * cfg.dice_loss_weight
        mask_loss = mask_bce + mask_dice
        return {
            "loss": ce_loss + mask_loss,
            "ce_loss": ce_loss,
            "mask_bce_loss": mask_bce,
            "mask_dice_loss": mask_dice,
            "mask_loss": mask_loss,
        }

    def evaluate_step(
        self,
        input_ids: jnp.ndarray,  # (1, L)
        position_ids: jnp.ndarray,
        images_sam: jnp.ndarray,  # (T, H, W, 3)
        pixel_patches: Optional[jnp.ndarray] = None,
        vision_layout: Optional[Dict[str, Any]] = None,
        compute_dtype=jnp.bfloat16,
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced [SEG] segmentation (ref evaluate :327-412).
        Returns low-res mask logits (T, 1, 4S, 4S); callers run
        ops.resize.postprocess_masks to the original frame size."""
        out = self.qwen(
            input_ids=input_ids,
            position_ids=position_ids,
            pixel_patches=pixel_patches,
            vision_layout=vision_layout,
            compute_dtype=compute_dtype,
        )
        seg_emb, has_seg = self._seg_embeddings(
            out["hidden_states"], input_ids
        )
        t = images_sam.shape[0]
        lang = jnp.broadcast_to(
            seg_emb[0][None, None, :], (t, 1, self.cfg.seg.out_dim)
        )
        sam_out = self.sam_model.decode_frames_with_language(
            images_sam, lang, multimask_output=False
        )
        return {
            "low_res_masks": sam_out["low_res_masks"],
            "has_seg": has_seg,
            "logits": out["logits"],
        }
