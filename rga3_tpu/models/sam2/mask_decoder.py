"""SAM2 mask decoder: two-way transformer + hypernetwork mask heads +
IoU / object-score heads + stability-based dynamic mask selection
(ref: model/sam2.py:1246-1483 TwoWayTransformer/Attention,
:1926-2210 MaskDecoder).

NHWC throughout; the [SEG] language embedding is concatenated to the sparse
prompt tokens by the caller (model.py), mirroring the UniGR extension point
(ref: model/sam2.py:3354-3358)."""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import Sam2Config
from .layers import ChannelLayerNorm, LayerNorm, MLP, SamAttention


class TwoWayAttentionBlock(nn.Module):
    cfg: Sam2Config
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        d, h = cfg.d_model, cfg.twoway_heads
        if self.skip_first_layer_pe:
            queries = SamAttention(d, h, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + SamAttention(d, h, name="self_attn")(
                q, q, queries
            )
        queries = LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + SamAttention(
            d, h, downsample_rate=2, name="cross_attn_token_to_image"
        )(q, k, keys)
        queries = LayerNorm(name="norm2")(queries)

        queries = queries + MLP(
            cfg.twoway_mlp_dim, d, 2, activation="relu", name="mlp"
        )(queries)
        queries = LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + SamAttention(
            d, h, downsample_rate=2, name="cross_attn_image_to_token"
        )(k, q, queries)
        keys = LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: Sam2Config

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, H, W, C); point_embedding (B, N, C).
        Returns (queries (B,N,C), keys (B,HW,C))."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c)
        queries = point_embedding
        for i in range(self.cfg.twoway_depth):
            queries, keys = TwoWayAttentionBlock(
                self.cfg, skip_first_layer_pe=(i == 0), name=f"layers_{i}"
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + SamAttention(
            c, self.cfg.twoway_heads, downsample_rate=2,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = LayerNorm(name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: Sam2Config

    def setup(self):
        cfg = self.cfg
        d = cfg.d_model
        self.num_mask_tokens = cfg.num_multimask_outputs + 1
        self.iou_token = nn.Embed(1, d, name="iou_token")
        self.mask_tokens = nn.Embed(self.num_mask_tokens, d, name="mask_tokens")
        self.obj_score_token = nn.Embed(1, d, name="obj_score_token")
        self.transformer = TwoWayTransformer(cfg, name="transformer")
        self.upscale_conv1 = nn.ConvTranspose(
            d // 4, (2, 2), strides=(2, 2), name="output_upscaling_0"
        )
        self.upscale_ln = ChannelLayerNorm(name="output_upscaling_1")
        self.upscale_conv2 = nn.ConvTranspose(
            d // 8, (2, 2), strides=(2, 2), name="output_upscaling_3"
        )
        # high-res skip projections (applied in forward_image, ref :2797-2803)
        self.conv_s0 = nn.Conv(d // 8, (1, 1), name="conv_s0")
        self.conv_s1 = nn.Conv(d // 4, (1, 1), name="conv_s1")
        self.hyper_mlps = [
            MLP(d, d // 8, 3, name=f"output_hypernetworks_mlps_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_head = MLP(
            256, self.num_mask_tokens, 3,
            sigmoid_output=cfg.iou_prediction_use_sigmoid,
            name="iou_prediction_head",
        )
        self.obj_score_head = MLP(d, 1, 3, name="pred_obj_score_head")

    def predict(
        self,
        image_embeddings: jnp.ndarray,  # (B, H, W, C)
        image_pe: jnp.ndarray,  # (H, W, C)
        sparse_prompt: jnp.ndarray,  # (B, N, C)
        dense_prompt: jnp.ndarray,  # (B, H, W, C)
        high_res_features: Tuple[jnp.ndarray, jnp.ndarray],  # s0 (B,4H,4W,C/8), s1 (B,2H,2W,C/4) pre-projected
    ):
        b = sparse_prompt.shape[0]
        output_tokens = jnp.concatenate(
            [
                self.obj_score_token.embedding,
                self.iou_token.embedding,
                self.mask_tokens.embedding,
            ],
            axis=0,
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
        iou_token_out = hs[:, 1]
        mask_tokens_out = hs[:, 2 : 2 + self.num_mask_tokens]

        h, w = src.shape[1:3]
        src_img = keys.reshape(b, h, w, -1)
        feat_s0, feat_s1 = high_res_features
        up = self.upscale_conv1(src_img) + feat_s1
        up = nn.gelu(self.upscale_ln(up), approximate=False)
        up = nn.gelu(
            self.upscale_conv2(up) + feat_s0, approximate=False
        )  # (B, 4H, 4W, C/8)

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
        object_score_logits = self.obj_score_head(hs[:, 0])
        return masks, iou_pred, mask_tokens_out, object_score_logits

    def _stability_scores(self, mask_logits):
        flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
        delta = self.cfg.dynamic_multimask_stability_delta
        area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
        return jnp.where(area_u > 0, area_i / area_u, 1.0)

    def dynamic_single_mask(self, all_masks, all_iou):
        """Stability fallback when outputting one mask (ref :2162-2210)."""
        multi = all_masks[:, 1:]
        multi_iou = all_iou[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        bidx = jnp.arange(all_masks.shape[0])
        best_masks = multi[bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]
        single = all_masks[:, :1]
        single_iou = all_iou[:, :1]
        stability = self._stability_scores(single)
        is_stable = stability >= self.cfg.dynamic_multimask_stability_thresh
        masks = jnp.where(is_stable[..., None, None], single, best_masks)
        iou = jnp.where(is_stable, single_iou, best_iou)
        return masks, iou

    def __call__(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt,
        dense_prompt,
        high_res_features,
        multimask_output: bool,
        training: bool = False,
    ):
        masks, iou_pred, mask_tokens_out, object_score_logits = self.predict(
            image_embeddings, image_pe, sparse_prompt, dense_prompt,
            high_res_features,
        )
        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
        elif self.cfg.dynamic_multimask_via_stability and not training:
            out_masks, out_iou = self.dynamic_single_mask(masks, iou_pred)
        else:
            out_masks = masks[:, 0:1]
            out_iou = iou_pred[:, 0:1]

        if multimask_output and self.cfg.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return out_masks, out_iou, sam_tokens_out, object_score_logits
