"""SAM-v1 architecture configs (legacy UniGR variant backbone).

Mirrors the reference build constants
(ref: model/segment_anything/build_sam.py:15-103 — ViT-H/L/B encoders,
prompt dim 256, image 1024, patch 16, window 14, TwoWayTransformer depth 2
/ mlp 2048 / heads 8, 3 multimask outputs).

Field names `d_model` / `image_size` / `feat_size` deliberately match
Sam2Config so the shared prompt-encoder / two-way-transformer modules are
reused verbatim (they duck-type on those fields).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

from ...config import ConfigBase


@dataclass(frozen=True)
class Sam1Config(ConfigBase):
    # ViT encoder (ref build_sam.py:66-81)
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    patch_size: int = 16
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    # decoder side (shared field names with Sam2Config)
    d_model: int = 256
    image_size: int = 1024
    num_multimask_outputs: int = 3
    twoway_depth: int = 2
    twoway_mlp_dim: int = 2048
    twoway_heads: int = 8
    iou_head_hidden: int = 256
    iou_head_depth: int = 3
    iou_prediction_use_sigmoid: bool = False
    # preprocessing (ref build_sam.py:100-101)
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)

    @property
    def feat_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size


SAM1_VIT_H = Sam1Config()
SAM1_VIT_L = Sam1Config(
    embed_dim=1024, depth=24, num_heads=16,
    global_attn_indexes=(5, 11, 17, 23),
)
SAM1_VIT_B = Sam1Config(
    embed_dim=768, depth=12, num_heads=12,
    global_attn_indexes=(2, 5, 8, 11),
)


def tiny_sam1_config(image_size: int = 64) -> Sam1Config:
    """Small config for tests. window 3 on a 4x4 grid exercises the
    pad-to-6 / crop window-partition path (ref image_encoder.py:267-318)."""
    return Sam1Config(
        embed_dim=32,
        depth=3,
        num_heads=2,
        global_attn_indexes=(1,),
        window_size=3,
        image_size=image_size,
        d_model=32,
        twoway_mlp_dim=64,
        twoway_heads=4,
        iou_head_hidden=32,
    )
