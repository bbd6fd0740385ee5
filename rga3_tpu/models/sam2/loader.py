"""SAM2 checkpoint loader: `sam2_hiera_large.pt` torch state dict -> flax
params pytree (ref loader with `.gamma -> .g_weight` remap:
model/sam2.py:30-85; our tree already uses g_weight).

Layout conversions:
  * Conv2d OIHW -> HWIO; ConvTranspose2d (in, out, h, w) -> HWIO with
    BOTH spatial dims flipped (torch's transposed conv correlates with
    the unflipped kernel while flax ConvTranspose flips it — see _convT,
    verified numerically).
  * Linear (out, in) -> (in, out).
  * Embedding kept (n, dim).
Host-side only (numpy); torch is used purely to deserialize the pickle.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd:
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        k = k.replace(".gamma", ".g_weight")
        out[k] = v.float().numpy()
    return out


def _set(tree: Dict[str, Any], path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _convT(w):
    """torch ConvTranspose2d (I, O, kH, kW) -> flax HWIO with spatial flip
    (torch's transposed conv correlates with the flipped kernel relative to
    flax.linen.ConvTranspose; verified numerically)."""
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
    )


def _lin(w):  # (out, in) -> (in, out)
    return np.transpose(w, (1, 0))


def convert_sam2_checkpoint(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch state dict -> params dict for Sam2Model (flax 'params' tree)."""
    p: Dict[str, Any] = {}

    def put(dst, src, f=None):
        v = sd[src]
        _set(p, dst, f(v) if f else v)

    # ---- top-level params
    p["no_mem_embed"] = sd["no_mem_embed"]
    p["no_mem_pos_enc"] = sd["no_mem_pos_enc"]
    p["maskmem_tpos_enc"] = sd["maskmem_tpos_enc"]
    p["no_obj_ptr"] = sd["no_obj_ptr"]
    for i in range(3):
        put(f"obj_ptr_proj/layers_{i}/kernel", f"obj_ptr_proj.layers.{i}.weight", _lin)
        put(f"obj_ptr_proj/layers_{i}/bias", f"obj_ptr_proj.layers.{i}.bias")

    # ---- image encoder: Hiera trunk
    put("image_encoder/trunk/patch_embed_proj/kernel",
        "image_encoder.trunk.patch_embed.proj.weight", _conv)
    put("image_encoder/trunk/patch_embed_proj/bias",
        "image_encoder.trunk.patch_embed.proj.bias")
    # pos embeds: torch (1, C, H, W) -> (1, H, W, C)
    _set(p, "image_encoder/trunk/pos_embed",
         np.transpose(sd["image_encoder.trunk.pos_embed"], (0, 2, 3, 1)))
    _set(p, "image_encoder/trunk/pos_embed_window",
         np.transpose(
             sd["image_encoder.trunk.pos_embed_window"], (0, 2, 3, 1)
         ))
    n_blocks = len(
        {int(m.group(1))
         for k in sd
         if (m := re.match(r"image_encoder\.trunk\.blocks\.(\d+)\.", k))}
    )
    for i in range(n_blocks):
        src = f"image_encoder.trunk.blocks.{i}"
        dst = f"image_encoder/trunk/blocks_{i}"
        for a, b in [("norm1", "norm1"), ("norm2", "norm2")]:
            put(f"{dst}/{b}/scale", f"{src}.{a}.weight")
            put(f"{dst}/{b}/bias", f"{src}.{a}.bias")
        put(f"{dst}/attn_qkv/kernel", f"{src}.attn.qkv.weight", _lin)
        put(f"{dst}/attn_qkv/bias", f"{src}.attn.qkv.bias")
        put(f"{dst}/attn_proj/kernel", f"{src}.attn.proj.weight", _lin)
        put(f"{dst}/attn_proj/bias", f"{src}.attn.proj.bias")
        put(f"{dst}/mlp_layers_0/kernel", f"{src}.mlp.layers.0.weight", _lin)
        put(f"{dst}/mlp_layers_0/bias", f"{src}.mlp.layers.0.bias")
        put(f"{dst}/mlp_layers_1/kernel", f"{src}.mlp.layers.1.weight", _lin)
        put(f"{dst}/mlp_layers_1/bias", f"{src}.mlp.layers.1.bias")
        if f"{src}.proj.weight" in sd:
            put(f"{dst}/proj/kernel", f"{src}.proj.weight", _lin)
            put(f"{dst}/proj/bias", f"{src}.proj.bias")

    # ---- FPN neck
    n_convs = len(
        {int(m.group(1))
         for k in sd
         if (m := re.match(r"image_encoder\.neck\.convs\.(\d+)\.", k))}
    )
    for i in range(n_convs):
        put(f"image_encoder/neck/convs_{i}_conv/kernel",
            f"image_encoder.neck.convs.{i}.conv.weight", _conv)
        put(f"image_encoder/neck/convs_{i}_conv/bias",
            f"image_encoder.neck.convs.{i}.conv.bias")

    # ---- memory attention
    n_layers = len(
        {int(m.group(1))
         for k in sd
         if (m := re.match(r"memory_attention\.layers\.(\d+)\.", k))}
    )
    for i in range(n_layers):
        src = f"memory_attention.layers.{i}"
        dst = f"memory_attention/layers_{i}"
        for attn, aname in [
            ("self_attn", "self_attn"), ("cross_attn_image", "cross_attn_image")
        ]:
            for proj in ["q_proj", "k_proj", "v_proj", "out_proj"]:
                put(f"{dst}/{aname}/{proj}/kernel",
                    f"{src}.{attn}.{proj}.weight", _lin)
                put(f"{dst}/{aname}/{proj}/bias", f"{src}.{attn}.{proj}.bias")
        for li in ["linear1", "linear2"]:
            put(f"{dst}/{li}/kernel", f"{src}.{li}.weight", _lin)
            put(f"{dst}/{li}/bias", f"{src}.{li}.bias")
        for ni in ["norm1", "norm2", "norm3"]:
            put(f"{dst}/{ni}/weight", f"{src}.{ni}.weight")
            put(f"{dst}/{ni}/bias", f"{src}.{ni}.bias")
    put("memory_attention/norm/weight", "memory_attention.norm.weight")
    put("memory_attention/norm/bias", "memory_attention.norm.bias")

    # ---- memory encoder
    for i in range(5):
        idx = 3 * i if i < 4 else 12
        src_i = idx
        w = f"memory_encoder.mask_downsampler.encoder.{src_i}.weight"
        if w in sd:
            put(f"memory_encoder/mask_downsampler/encoder_{idx}/kernel", w, _conv)
            put(f"memory_encoder/mask_downsampler/encoder_{idx}/bias",
                f"memory_encoder.mask_downsampler.encoder.{src_i}.bias")
        if i < 4:
            ln = 3 * i + 1
            put(f"memory_encoder/mask_downsampler/encoder_{ln}/weight",
                f"memory_encoder.mask_downsampler.encoder.{ln}.weight")
            put(f"memory_encoder/mask_downsampler/encoder_{ln}/bias",
                f"memory_encoder.mask_downsampler.encoder.{ln}.bias")
    put("memory_encoder/pix_feat_proj/kernel",
        "memory_encoder.pix_feat_proj.weight", _conv)
    put("memory_encoder/pix_feat_proj/bias", "memory_encoder.pix_feat_proj.bias")
    for i in range(2):
        src = f"memory_encoder.fuser.layers.{i}"
        dst = f"memory_encoder/fuser_layers_{i}"
        put(f"{dst}/dwconv/kernel", f"{src}.dwconv.weight", _conv)
        put(f"{dst}/dwconv/bias", f"{src}.dwconv.bias")
        put(f"{dst}/norm/weight", f"{src}.norm.weight")
        put(f"{dst}/norm/bias", f"{src}.norm.bias")
        put(f"{dst}/pwconv1/kernel", f"{src}.pwconv1.weight", _lin)
        put(f"{dst}/pwconv1/bias", f"{src}.pwconv1.bias")
        put(f"{dst}/pwconv2/kernel", f"{src}.pwconv2.weight", _lin)
        put(f"{dst}/pwconv2/bias", f"{src}.pwconv2.bias")
        put(f"{dst}/g_weight", f"{src}.g_weight")
    put("memory_encoder/out_proj/kernel", "memory_encoder.out_proj.weight", _conv)
    put("memory_encoder/out_proj/bias", "memory_encoder.out_proj.bias")

    # ---- prompt encoder
    _set(p, "sam_prompt_encoder/pe_layer/positional_encoding_gaussian_matrix",
         sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"])
    for i in range(4):
        _set(p, f"sam_prompt_encoder/point_embeddings_{i}/embedding",
             sd[f"sam_prompt_encoder.point_embeddings.{i}.weight"])
    _set(p, "sam_prompt_encoder/not_a_point_embed/embedding",
         sd["sam_prompt_encoder.not_a_point_embed.weight"])
    _set(p, "sam_prompt_encoder/no_mask_embed/embedding",
         sd["sam_prompt_encoder.no_mask_embed.weight"])
    for dst_i, src_i in [(0, 0), (3, 3), (6, 6)]:
        put(f"sam_prompt_encoder/mask_downscaling_{dst_i}/kernel",
            f"sam_prompt_encoder.mask_downscaling.{src_i}.weight", _conv)
        put(f"sam_prompt_encoder/mask_downscaling_{dst_i}/bias",
            f"sam_prompt_encoder.mask_downscaling.{src_i}.bias")
    for ln_i in [1, 4]:
        put(f"sam_prompt_encoder/mask_downscaling_{ln_i}/weight",
            f"sam_prompt_encoder.mask_downscaling.{ln_i}.weight")
        put(f"sam_prompt_encoder/mask_downscaling_{ln_i}/bias",
            f"sam_prompt_encoder.mask_downscaling.{ln_i}.bias")

    # ---- mask decoder
    md = "sam_mask_decoder"
    _set(p, f"{md}/iou_token/embedding", sd[f"{md}.iou_token.weight"])
    _set(p, f"{md}/mask_tokens/embedding", sd[f"{md}.mask_tokens.weight"])
    _set(p, f"{md}/obj_score_token/embedding",
         sd[f"{md}.obj_score_token.weight"])
    for i in range(2):
        src = f"{md}.transformer.layers.{i}"
        dst = f"{md}/transformer/layers_{i}"
        for attn in ["self_attn", "cross_attn_token_to_image",
                     "cross_attn_image_to_token"]:
            for proj in ["q_proj", "k_proj", "v_proj", "out_proj"]:
                put(f"{dst}/{attn}/{proj}/kernel",
                    f"{src}.{attn}.{proj}.weight", _lin)
                put(f"{dst}/{attn}/{proj}/bias", f"{src}.{attn}.{proj}.bias")
        for ni in ["norm1", "norm2", "norm3", "norm4"]:
            put(f"{dst}/{ni}/weight", f"{src}.{ni}.weight")
            put(f"{dst}/{ni}/bias", f"{src}.{ni}.bias")
        for li in range(2):
            put(f"{dst}/mlp/layers_{li}/kernel",
                f"{src}.mlp.layers.{li}.weight", _lin)
            put(f"{dst}/mlp/layers_{li}/bias", f"{src}.mlp.layers.{li}.bias")
    for proj in ["q_proj", "k_proj", "v_proj", "out_proj"]:
        put(f"{md}/transformer/final_attn_token_to_image/{proj}/kernel",
            f"{md}.transformer.final_attn_token_to_image.{proj}.weight", _lin)
        put(f"{md}/transformer/final_attn_token_to_image/{proj}/bias",
            f"{md}.transformer.final_attn_token_to_image.{proj}.bias")
    put(f"{md}/transformer/norm_final_attn/weight",
        f"{md}.transformer.norm_final_attn.weight")
    put(f"{md}/transformer/norm_final_attn/bias",
        f"{md}.transformer.norm_final_attn.bias")
    put(f"{md}/output_upscaling_0/kernel",
        f"{md}.output_upscaling.0.weight", _convT)
    put(f"{md}/output_upscaling_0/bias", f"{md}.output_upscaling.0.bias")
    put(f"{md}/output_upscaling_1/weight", f"{md}.output_upscaling.1.weight")
    put(f"{md}/output_upscaling_1/bias", f"{md}.output_upscaling.1.bias")
    put(f"{md}/output_upscaling_3/kernel",
        f"{md}.output_upscaling.3.weight", _convT)
    put(f"{md}/output_upscaling_3/bias", f"{md}.output_upscaling.3.bias")
    put(f"{md}/conv_s0/kernel", f"{md}.conv_s0.weight", _conv)
    put(f"{md}/conv_s0/bias", f"{md}.conv_s0.bias")
    put(f"{md}/conv_s1/kernel", f"{md}.conv_s1.weight", _conv)
    put(f"{md}/conv_s1/bias", f"{md}.conv_s1.bias")
    for i in range(4):
        for li in range(3):
            put(f"{md}/output_hypernetworks_mlps_{i}/layers_{li}/kernel",
                f"{md}.output_hypernetworks_mlps.{i}.layers.{li}.weight", _lin)
            put(f"{md}/output_hypernetworks_mlps_{i}/layers_{li}/bias",
                f"{md}.output_hypernetworks_mlps.{i}.layers.{li}.bias")
    for li in range(3):
        put(f"{md}/iou_prediction_head/layers_{li}/kernel",
            f"{md}.iou_prediction_head.layers.{li}.weight", _lin)
        put(f"{md}/iou_prediction_head/layers_{li}/bias",
            f"{md}.iou_prediction_head.layers.{li}.bias")
        put(f"{md}/pred_obj_score_head/layers_{li}/kernel",
            f"{md}.pred_obj_score_head.layers.{li}.weight", _lin)
        put(f"{md}/pred_obj_score_head/layers_{li}/bias",
            f"{md}.pred_obj_score_head.layers.{li}.bias")

    return p


def load_sam2_params(path: str) -> Dict[str, Any]:
    return {"params": convert_sam2_checkpoint(load_torch_state_dict(path))}
