"""SAM2 top-level model: image encoding, language-prompted mask decoding
(the UniGR [SEG] extension point), and the memory-conditioned tracking step.

Reference behavior notes (all model/sam2.py):
  * forward_image pre-projects high-res skip features with the decoder's
    conv_s0/conv_s1 (:2790-2803).
  * UniGR's video eval prompts EVERY frame with the language embedding as an
    init-cond frame, so the hot path decodes all frames with
    `no_mem_embed` added and no memory attention (:3335-3371 via
    `directly_add_no_mem_embed`, language concat at :3354-3358). We batch
    that over frames in one jitted call — the reference loops in Python
    per frame (its bottleneck, SURVEY.md §3.2).
  * The memory-conditioned `track_step` (:3030-3259) is kept for
    point-prompted tracking and propagation from sparse cond frames; the
    static-shape memory bank lives in video.py.
  * Object pointers: 256-d token -> 4 x 64-d memory tokens (:3352-3359 of
    _prepare_memory_conditioned_features).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resize import resize_bilinear
from .config import Sam2Config
from .layers import MLP
from .mask_decoder import MaskDecoder
from .memory import MemoryAttention, MemoryEncoder
from .neck import ImageEncoder
from .prompt_encoder import PromptEncoder



class Sam2Model(nn.Module):
    cfg: Sam2Config

    def setup(self):
        cfg = self.cfg
        self.image_encoder = ImageEncoder(cfg, name="image_encoder")
        self.memory_attention = MemoryAttention(cfg, name="memory_attention")
        self.memory_encoder = MemoryEncoder(cfg, name="memory_encoder")
        self.sam_prompt_encoder = PromptEncoder(cfg, name="sam_prompt_encoder")
        self.sam_mask_decoder = MaskDecoder(cfg, name="sam_mask_decoder")
        d = cfg.hidden_dim
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.zeros, (1, 1, d)
        )
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", nn.initializers.zeros, (1, 1, d)
        )
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc",
            nn.initializers.zeros,
            (cfg.num_maskmem, 1, 1, cfg.mem_dim),
        )
        self.no_obj_ptr = self.param(
            "no_obj_ptr", nn.initializers.zeros, (1, d)
        )
        self.obj_ptr_proj = MLP(d, d, 3, name="obj_ptr_proj")

    def __call__(self, images: jnp.ndarray, language_embd: jnp.ndarray):
        """Init-coverage forward: touches every submodule so `model.init`
        creates the full parameter tree (flax only materializes params on
        use). Returns the language-decode output."""
        cfg = self.cfg
        out = self.decode_frames_with_language(images, language_embd)
        feats = self.forward_image(images[:1])
        s2 = feats["backbone_fpn"][2]
        pos2 = feats["vision_pos_enc"][2]
        memf, memp = self.encode_new_memory(
            s2, out["high_res_masks"][:1].transpose(0, 2, 3, 1)
        )
        b, s, _, md = memf.shape
        mem = memf.reshape(b, s * s, md)
        mem_pos = memp.reshape(1, s * s, md).repeat(b, 0)
        ptr_tok = self.obj_ptrs_to_tokens(out["obj_ptr"][None, :1])
        mem = jnp.concatenate([mem, ptr_tok.transpose(1, 0, 2)], axis=1)
        mem_pos = jnp.concatenate(
            [mem_pos, jnp.zeros_like(ptr_tok.transpose(1, 0, 2))], axis=1
        )
        valid = jnp.ones(mem.shape[:2], bool)
        self.condition_on_memory(
            s2, pos2, mem, mem_pos, valid, ptr_tok.shape[0]
        )
        # touch point/mask prompt branches
        self.sam_prompt_encoder(
            point_coords=jnp.zeros((1, 1, 2), jnp.float32),
            point_labels=jnp.ones((1, 1), jnp.int32),
            masks=jnp.zeros((1, 4 * cfg.feat_size, 4 * cfg.feat_size, 1)),
        )
        return out

    # ------------------------------------------------------------------
    # image encoding
    # ------------------------------------------------------------------
    def forward_image(
        self, images: jnp.ndarray, stop_backbone_grad: bool = False
    ) -> Dict[str, List[jnp.ndarray]]:
        """images (B, H, W, 3) normalized. Returns fpn features with
        high-res levels pre-projected for the decoder skip connections.

        stop_backbone_grad cuts the gradient at the trunk+neck boundary:
        the reference always freezes the SAM2 image encoder during training
        (ref qwen_2_5_vl_sam2.py:120-126), so its backward pass (~2x the
        trunk forward FLOPs at 1024²) is pure waste. conv_s0/conv_s1 sit
        BELOW the cut — they belong to sam_mask_decoder, which the
        reference trains (ref train_joint.py:237-251).

        uint8 input is accepted too: the ImageNet normalization then
        runs here on device (ops.resize.sam_normalize_maybe),
        bit-identical to host-side normalization at 4x fewer
        host->device bytes."""
        from ...ops.resize import sam_normalize_maybe

        out = self.image_encoder(sam_normalize_maybe(images))
        if stop_backbone_grad:
            out = jax.lax.stop_gradient(out)
        fpn = list(out["backbone_fpn"])
        fpn[0] = self.sam_mask_decoder.conv_s0(fpn[0])
        fpn[1] = self.sam_mask_decoder.conv_s1(fpn[1])
        return {"backbone_fpn": fpn, "vision_pos_enc": out["vision_pos_enc"]}

    # ------------------------------------------------------------------
    # SAM heads with optional language prompt
    # ------------------------------------------------------------------
    def forward_sam_heads(
        self,
        backbone_features: jnp.ndarray,  # (B, s, s, C), memory-conditioned
        high_res_features: Tuple[jnp.ndarray, jnp.ndarray],
        language_embd: Optional[jnp.ndarray] = None,  # (B, N, C)
        point_coords: Optional[jnp.ndarray] = None,
        point_labels: Optional[jnp.ndarray] = None,
        mask_inputs: Optional[jnp.ndarray] = None,  # (B, 4s, 4s, 1)
        multimask_output: bool = True,
        training: bool = False,
    ):
        cfg = self.cfg
        b = backbone_features.shape[0]
        sparse, dense = self.sam_prompt_encoder(
            point_coords=point_coords,
            point_labels=point_labels,
            masks=mask_inputs,
            batch=b,
        )
        if language_embd is not None:
            sparse = jnp.concatenate(
                [sparse, language_embd.astype(sparse.dtype)], axis=1
            )
        image_pe = self.sam_prompt_encoder.dense_pe()
        low_res_multimasks, ious, sam_tokens_out, object_score_logits = (
            self.sam_mask_decoder(
                backbone_features,
                image_pe,
                sparse,
                dense,
                high_res_features,
                multimask_output=multimask_output,
                training=training,
            )
        )
        # (the reference's UniGR variant disables the NO_OBJ_SCORE mask fill
        #  on low_res_multimasks — ref sam2.py:3380-3387 commented out)
        low_res_multimasks = low_res_multimasks.astype(jnp.float32)

        # Select best-IoU mask at LOW res, then upscale only the winner:
        # bilinear resize is per-channel independent, so select-then-resize
        # is numerically identical to the reference's resize-then-select
        # (ref sam2.py:3389-3407) at 1/3 the 1024² interpolation + HBM
        # traffic.
        sam_output_token = sam_tokens_out[:, 0]
        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            bidx = jnp.arange(b)
            low_res_masks = low_res_multimasks[bidx, best][:, None]
            if sam_tokens_out.shape[1] > 1:
                sam_output_token = sam_tokens_out[bidx, best]
        else:
            low_res_masks = low_res_multimasks
        high_res_masks = resize_bilinear(
            low_res_masks, (cfg.image_size, cfg.image_size)
        )

        obj_ptr = self.obj_ptr_proj(sam_output_token)
        is_obj_appearing = (object_score_logits > 0).astype(jnp.float32)
        obj_ptr = is_obj_appearing * obj_ptr + (
            1.0 - is_obj_appearing
        ) * self.no_obj_ptr
        return {
            "low_res_multimasks": low_res_multimasks,
            "ious": ious,
            "low_res_masks": low_res_masks,
            "high_res_masks": high_res_masks,
            "obj_ptr": obj_ptr,
            "object_score_logits": object_score_logits,
        }

    # ------------------------------------------------------------------
    # UniGR language paths
    # ------------------------------------------------------------------
    def decode_frames_with_language(
        self,
        images: jnp.ndarray,  # (T, H, W, 3) normalized frames
        language_embd: jnp.ndarray,  # (T, N, C) — usually N=1
        multimask_output: bool = True,
        training: bool = False,
        stop_backbone_grad: bool = False,
    ):
        """Batched no-memory language decoding of all frames at once — the
        TPU-native equivalent of get_sam2_embeddings(_train) +
        inject_language_embd_train / language_embd_inference
        (ref sam2.py:343-404). Every frame is an init-cond frame, so
        pix_feat = stride-16 feature + no_mem_embed."""
        feats = self.forward_image(
            images, stop_backbone_grad=stop_backbone_grad
        )
        s0, s1, s2 = feats["backbone_fpn"]
        return self.decode_features_with_language(
            s0, s1, s2, language_embd,
            multimask_output=multimask_output, training=training,
        )

    def decode_features_with_language(
        self,
        s0: jnp.ndarray,
        s1: jnp.ndarray,
        s2: jnp.ndarray,
        language_embd: jnp.ndarray,
        multimask_output: bool = True,
        training: bool = False,
    ):
        """Language decode from pre-computed fpn features — lets eval
        drivers encode each video frame ONCE and decode many expressions
        against it (the reference re-runs the whole backbone per
        expression, ref inference_mevis.py:156-217)."""
        pix = s2 + self.no_mem_embed.reshape(1, 1, 1, -1).astype(s2.dtype)
        return self.forward_sam_heads(
            pix,
            (s0, s1),
            language_embd=language_embd,
            multimask_output=multimask_output,
            training=training,
        )

    # ------------------------------------------------------------------
    # memory-conditioned tracking (consumed by video.py's scan)
    # ------------------------------------------------------------------
    def condition_on_memory(
        self,
        current_feat: jnp.ndarray,  # (B, s, s, C)
        current_pos: jnp.ndarray,  # (B, s, s, C)
        memory: jnp.ndarray,  # (B, Lk, mem_dim) concatenated bank
        memory_pos: jnp.ndarray,  # (B, Lk, mem_dim)
        memory_valid: jnp.ndarray,  # (B, Lk) bool
        num_obj_ptr_tokens: int,
    ) -> jnp.ndarray:
        b, s, _, c = current_feat.shape
        cur = current_feat.reshape(b, s * s, c)
        cur_pos = current_pos.reshape(b, s * s, c)
        out = self.memory_attention(
            cur, cur_pos, memory, memory_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens,
            k_valid=memory_valid,
        )
        return out.reshape(b, s, s, c)

    def encode_new_memory(
        self,
        current_feat: jnp.ndarray,  # (B, s, s, C) stride-16 features
        high_res_masks: jnp.ndarray,  # (B, image, image, 1) logits
    ):
        """ref _encode_new_memory (:2991-3029): scaled sigmoid + memory
        encoder (skip_mask_sigmoid=True since we apply it here)."""
        cfg = self.cfg
        mask_for_mem = jax.nn.sigmoid(high_res_masks)
        mask_for_mem = (
            mask_for_mem * cfg.sigmoid_scale_for_mem_enc
            + cfg.sigmoid_bias_for_mem_enc
        )
        feats, pos = self.memory_encoder(
            current_feat, mask_for_mem, skip_mask_sigmoid=True
        )
        return feats, pos

    def obj_ptrs_to_tokens(self, obj_ptrs: jnp.ndarray) -> jnp.ndarray:
        """(N, B, C) pointers -> (N * C/mem_dim, B, mem_dim) tokens."""
        n, b, c = obj_ptrs.shape
        r = c // self.cfg.mem_dim
        toks = obj_ptrs.reshape(n, b, r, self.cfg.mem_dim)
        return toks.transpose(0, 2, 1, 3).reshape(n * r, b, self.cfg.mem_dim)
