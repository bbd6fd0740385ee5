"""UniGR composite model: Qwen2.5-VL + [SEG] projection head + SAM2.

JAX rebuild of the reference's core component
(ref: model/qwen_2_5_vl_sam2.py:104-393 — UniGRConfig/UniGRModel):

  * `text_hidden_fcs`: Linear(H,H) -> ReLU -> Linear(H,256) projection from
    LLM hidden size to the SAM2 prompt dim (:131-140).
  * `train_forward` = the reference's `model_forward` training branch
    (:149-321): Qwen forward with hidden states, [SEG] gather shifted left
    by one, per-sample tiling across SAM frames, batched no-memory SAM2
    decode, weighted ce + bce + dice loss. Static shapes: samples without a
    [SEG] token contribute zero-weighted mask losses (the reference's
    `pred_mask[0:0]` skip, :289-291).
  * `evaluate_step` = the reference's `evaluate` (:325-393): [SEG] from
    input_ids, then language-prompted per-frame SAM2 decode over all video
    frames (batched here — see models/sam2/video.py for why no memory
    attention runs in this path).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import ConfigBase, SegHeadConfig
from ...ops import losses as loss_ops
from ...ops import resize as resize_ops
from ...ops.resize import resize_bilinear
from ...ops.seg_gather import gather_seg_embeddings
from ..qwen25vl.config import Qwen25VLConfig
from ..qwen25vl.model import Qwen25VL
from ..sam2.config import Sam2Config
from ..sam2.model import Sam2Model


@dataclass(frozen=True)
class UniGRConfig(ConfigBase):
    qwen: Qwen25VLConfig = field(default_factory=Qwen25VLConfig)
    sam2: Sam2Config = field(default_factory=Sam2Config)
    seg: SegHeadConfig = field(default_factory=SegHeadConfig)


class SegProjection(nn.Module):
    """text_hidden_fcs (ref :131-140). Dropout is 0 in the release config."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = x.shape[-1]
        x = nn.Dense(h, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, name="fc2")(x)


class UniGR(nn.Module):
    cfg: UniGRConfig
    remat: Any = False  # False | True | "full" | "dots" | "none"

    def setup(self):
        self.qwen = Qwen25VL(self.cfg.qwen, remat=self.remat, name="qwen")
        self.grounding_encoder = Sam2Model(
            self.cfg.sam2, name="grounding_encoder"
        )
        self.text_hidden_fcs = SegProjection(
            self.cfg.seg.out_dim, name="text_hidden_fcs"
        )

    def __call__(self, images, language_embd, input_ids):
        """Init-coverage forward (see Sam2Model.__call__): touches the LM,
        the vision tower (one 2x2 merged grid), the seg head, and SAM2."""
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
        emb = self.text_hidden_fcs(out["hidden_states"])
        return self.grounding_encoder(images, language_embd)

    # ------------------------------------------------------------------
    def _seg_embeddings(
        self, hidden: jnp.ndarray, token_ids: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        projected = self.text_hidden_fcs(hidden)
        return gather_seg_embeddings(
            projected, token_ids, self.cfg.seg.seg_token_id
        )

    def train_forward(
        self,
        input_ids: jnp.ndarray,  # (B, L)
        labels: jnp.ndarray,  # (B, L), -100 masked
        position_ids: jnp.ndarray,  # (3, B, L)
        segment_ids: Optional[jnp.ndarray],  # (B, L)
        images_sam: jnp.ndarray,  # (B, T, H, W, 3) normalized
        gt_masks: jnp.ndarray,  # (B, T, H, W) float 0/1 at SAM resolution
        masks_valid: jnp.ndarray,  # (B,) 1.0 when the sample supervises seg
        pixel_patches: Optional[jnp.ndarray] = None,
        vision_layout: Optional[Dict[str, Any]] = None,
        compute_dtype=jnp.bfloat16,
    ) -> Dict[str, jnp.ndarray]:
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
        # tile across SAM frames: (B, D) -> (B*T, 1, D) (ref :219-234)
        lang = jnp.broadcast_to(
            seg_emb[:, None, :], (b, t, cfg.out_dim)
        ).reshape(b * t, 1, cfg.out_dim)

        frames = images_sam.reshape(b * t, *images_sam.shape[2:])
        # normalize (uint8 ship) in f32, then run the trunk in the
        # compute dtype — without the cast the SAM trunk silently rides
        # the f32 input dtype (2x HBM/VMEM, and at 3B shapes the fused
        # blocks' f32 VMEM footprint fails to compile)
        frames = resize_ops.sam_normalize_maybe(frames).astype(
            compute_dtype
        )
        sam_out = self.grounding_encoder.decode_frames_with_language(
            frames, lang, multimask_output=True, training=True,
            stop_backbone_grad=cfg.freeze_sam_backbone,
        )
        high_res = sam_out["high_res_masks"][:, 0]  # (B*T, H, W)
        size = gt_masks.shape[-2:]
        pred = resize_bilinear(high_res, size).reshape(b, t, *size)

        # per-sample loss weights: valid when sample has [SEG] and masks
        valid = (
            has_seg.astype(jnp.float32) * masks_valid.astype(jnp.float32)
        )
        valid_bt = jnp.repeat(valid, t)
        pred_flat = pred.reshape(b * t, *size)
        gt_flat = gt_masks.reshape(b * t, *size)
        mask_bce = loss_ops.masked_sigmoid_ce_loss(
            pred_flat, gt_flat, valid_bt
        ) * cfg.bce_loss_weight
        mask_dice = loss_ops.masked_dice_loss(
            pred_flat, gt_flat, valid_bt, scale=cfg.dice_scale
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
        images_sam: jnp.ndarray,  # (T, H, W, 3) all video frames
        pixel_patches: Optional[jnp.ndarray] = None,
        vision_layout: Optional[Dict[str, Any]] = None,
        compute_dtype=jnp.bfloat16,
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced [SEG] segmentation (ref evaluate :325-393).
        Returns high-res mask logits (T, 1, S, S) at SAM resolution;
        the caller resizes to the original video size and thresholds."""
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
        sam_out = self.grounding_encoder.decode_frames_with_language(
            resize_ops.sam_normalize_maybe(images_sam).astype(
                compute_dtype
            ),
            lang, multimask_output=True, training=False,
        )
        return {
            "high_res_masks": sam_out["high_res_masks"],
            "has_seg": has_seg,
            "logits": out["logits"],
        }
