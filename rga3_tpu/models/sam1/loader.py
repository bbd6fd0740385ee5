"""SAM-v1 checkpoint loader: Meta `sam_vit_h_4b8939.pth` state dict ->
flax params pytree (ref load: model/segment_anything/build_sam.py:104-107).

Same layout conventions as the SAM2 loader (Conv OIHW -> HWIO,
ConvTranspose IOHW -> flipped HWIO, Linear transposed); torch is used only
to deserialize the pickle."""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from ..sam2.loader import _conv, _convT, _lin, _set
from .config import Sam1Config


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd:
        sd = sd["model"]
    return {k: v.float().numpy() for k, v in sd.items()}


def convert_sam1_checkpoint(
    sd: Dict[str, np.ndarray], cfg: Sam1Config
) -> Dict[str, Any]:
    p: Dict[str, Any] = {}

    def put(dst, src, f=None):
        v = sd[src]
        _set(p, dst, f(v) if f else v)

    # ---- image encoder
    enc = "image_encoder"
    put(f"{enc}/patch_embed_proj/kernel", f"{enc}.patch_embed.proj.weight",
        _conv)
    put(f"{enc}/patch_embed_proj/bias", f"{enc}.patch_embed.proj.bias")
    # pos_embed is stored (1, H, W, C) in the reference already
    put(f"{enc}/pos_embed", f"{enc}.pos_embed")
    n_blocks = len(
        {int(m.group(1))
         for k in sd
         if (m := re.match(rf"{enc}\.blocks\.(\d+)\.", k))}
    )
    for i in range(n_blocks):
        src = f"{enc}.blocks.{i}"
        dst = f"{enc}/blocks_{i}"
        for ln in ["norm1", "norm2"]:
            put(f"{dst}/{ln}/weight", f"{src}.{ln}.weight")
            put(f"{dst}/{ln}/bias", f"{src}.{ln}.bias")
        put(f"{dst}/attn/qkv/kernel", f"{src}.attn.qkv.weight", _lin)
        put(f"{dst}/attn/qkv/bias", f"{src}.attn.qkv.bias")
        put(f"{dst}/attn/proj/kernel", f"{src}.attn.proj.weight", _lin)
        put(f"{dst}/attn/proj/bias", f"{src}.attn.proj.bias")
        put(f"{dst}/attn/rel_pos_h", f"{src}.attn.rel_pos_h")
        put(f"{dst}/attn/rel_pos_w", f"{src}.attn.rel_pos_w")
        put(f"{dst}/mlp_lin1/kernel", f"{src}.mlp.lin1.weight", _lin)
        put(f"{dst}/mlp_lin1/bias", f"{src}.mlp.lin1.bias")
        put(f"{dst}/mlp_lin2/kernel", f"{src}.mlp.lin2.weight", _lin)
        put(f"{dst}/mlp_lin2/bias", f"{src}.mlp.lin2.bias")
    for conv_i, ln_i in [(0, 1), (2, 3)]:
        put(f"{enc}/neck_{conv_i}/kernel", f"{enc}.neck.{conv_i}.weight",
            _conv)
        put(f"{enc}/neck_{ln_i}/weight", f"{enc}.neck.{ln_i}.weight")
        put(f"{enc}/neck_{ln_i}/bias", f"{enc}.neck.{ln_i}.bias")

    # ---- prompt encoder (same structure as SAM2's, different prefix)
    pe = "prompt_encoder"
    _set(p, f"{pe}/pe_layer/positional_encoding_gaussian_matrix",
         sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"])
    for i in range(4):
        _set(p, f"{pe}/point_embeddings_{i}/embedding",
             sd[f"{pe}.point_embeddings.{i}.weight"])
    _set(p, f"{pe}/not_a_point_embed/embedding",
         sd[f"{pe}.not_a_point_embed.weight"])
    _set(p, f"{pe}/no_mask_embed/embedding", sd[f"{pe}.no_mask_embed.weight"])
    for conv_i in [0, 3, 6]:
        put(f"{pe}/mask_downscaling_{conv_i}/kernel",
            f"{pe}.mask_downscaling.{conv_i}.weight", _conv)
        put(f"{pe}/mask_downscaling_{conv_i}/bias",
            f"{pe}.mask_downscaling.{conv_i}.bias")
    for ln_i in [1, 4]:
        put(f"{pe}/mask_downscaling_{ln_i}/weight",
            f"{pe}.mask_downscaling.{ln_i}.weight")
        put(f"{pe}/mask_downscaling_{ln_i}/bias",
            f"{pe}.mask_downscaling.{ln_i}.bias")

    # ---- mask decoder
    md = "mask_decoder"
    _set(p, f"{md}/iou_token/embedding", sd[f"{md}.iou_token.weight"])
    _set(p, f"{md}/mask_tokens/embedding", sd[f"{md}.mask_tokens.weight"])
    for i in range(cfg.twoway_depth):
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
        # SAM-v1 two-way MLP uses lin1/lin2 (common.MLPBlock)
        put(f"{dst}/mlp/layers_0/kernel", f"{src}.mlp.lin1.weight", _lin)
        put(f"{dst}/mlp/layers_0/bias", f"{src}.mlp.lin1.bias")
        put(f"{dst}/mlp/layers_1/kernel", f"{src}.mlp.lin2.weight", _lin)
        put(f"{dst}/mlp/layers_1/bias", f"{src}.mlp.lin2.bias")
    for proj in ["q_proj", "k_proj", "v_proj", "out_proj"]:
        put(f"{md}/transformer/final_attn_token_to_image/{proj}/kernel",
            f"{md}.transformer.final_attn_token_to_image.{proj}.weight",
            _lin)
        put(f"{md}/transformer/final_attn_token_to_image/{proj}/bias",
            f"{md}.transformer.final_attn_token_to_image.{proj}.bias")
    put(f"{md}/transformer/norm_final_attn/weight",
        f"{md}.transformer.norm_final_attn.weight")
    put(f"{md}/transformer/norm_final_attn/bias",
        f"{md}.transformer.norm_final_attn.bias")
    put(f"{md}/output_upscaling_0/kernel", f"{md}.output_upscaling.0.weight",
        _convT)
    put(f"{md}/output_upscaling_0/bias", f"{md}.output_upscaling.0.bias")
    put(f"{md}/output_upscaling_1/weight", f"{md}.output_upscaling.1.weight")
    put(f"{md}/output_upscaling_1/bias", f"{md}.output_upscaling.1.bias")
    put(f"{md}/output_upscaling_3/kernel", f"{md}.output_upscaling.3.weight",
        _convT)
    put(f"{md}/output_upscaling_3/bias", f"{md}.output_upscaling.3.bias")
    n_mask_tokens = cfg.num_multimask_outputs + 1
    for i in range(n_mask_tokens):
        for li in range(3):
            put(f"{md}/output_hypernetworks_mlps_{i}/layers_{li}/kernel",
                f"{md}.output_hypernetworks_mlps.{i}.layers.{li}.weight",
                _lin)
            put(f"{md}/output_hypernetworks_mlps_{i}/layers_{li}/bias",
                f"{md}.output_hypernetworks_mlps.{i}.layers.{li}.bias")
    for li in range(cfg.iou_head_depth):
        put(f"{md}/iou_prediction_head/layers_{li}/kernel",
            f"{md}.iou_prediction_head.layers.{li}.weight", _lin)
        put(f"{md}/iou_prediction_head/layers_{li}/bias",
            f"{md}.iou_prediction_head.layers.{li}.bias")

    return p


def load_sam1_params(path: str, cfg: Sam1Config) -> Dict[str, Any]:
    return {
        "params": convert_sam1_checkpoint(load_torch_state_dict(path), cfg)
    }
