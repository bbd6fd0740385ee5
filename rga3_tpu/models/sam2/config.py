"""SAM2 (Hiera) architecture configs.

All constants mirror the vendored reference build
(ref: model/sam2.py:87-325 — Hiera-L trunk, FPN neck d_model 256, 4-layer
memory attention, memory encoder out_dim 64, predictor flags at :97-136).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

from ...config import ConfigBase


@dataclass(frozen=True)
class HieraConfig(ConfigBase):
    embed_dim: int = 144
    num_heads: int = 2  # initial; doubles per stage
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    global_att_blocks: Tuple[int, ...] = (23, 33, 43)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    window_spec: Tuple[int, ...] = (8, 4, 16, 8)
    q_stride: Tuple[int, int] = (2, 2)
    q_pool: int = 3  # number of pooling stage transitions
    dim_mul: float = 2.0
    head_mul: float = 2.0
    mlp_ratio: float = 4.0
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3
    # GELU variant in the MLP: tanh approximation (True, the v5e-tuned
    # choice, +10% decode fps) or exact erf (False). Captured in saved
    # configs so train/eval always agree; RGA3_GELU_EXACT=1/0 overrides
    # process-wide (ops.fused_block.gelu_variant).
    gelu_tanh: bool = True
    # block-diagonal Pallas kernel for non-pooling windowed blocks
    # (fallback switch for A/B benchmarking and debugging)
    use_window_kernel: bool = True
    # whole-block fused Pallas kernel (LN+attn+proj+LN+MLP); measured ~2x
    # per-block vs the unfused path on v5e. Takes precedence over
    # use_window_kernel where it applies (windowed, no pool, dim==dim_out,
    # dim <= fused_block_max_dim so weights stay resident in ~16MB VMEM).
    use_fused_block: bool = True
    fused_block_max_dim: int = 576
    # block_q for fused blocks whose window < 256 tokens (stages 1/2):
    # balances masked-attention FLOP waste (grows with block) against MXU
    # fill (shrinks with block). A/B-tuned on v5e.
    fused_block_q_small: int = 512
    # block_q for fused blocks with window >= 256 tokens (stage 3). 0 =
    # one window per block (mask-free). NOTE: at Hiera-L stage 3 (D=576)
    # the kernel's scoped-VMEM guard clamps any block > 256 back down, so
    # values above 256 are effectively identical to 256 on v5e
    # (ops/fused_block.py VMEM sizing).
    fused_block_q_large: int = 0
    # split fusion (prologue/attention/epilogue kernels with an F-blocked
    # MLP) for windowed blocks wider than fused_block_max_dim (stage 4,
    # D=1152, whose 32 MB of weights cannot stay VMEM-resident)
    use_split_fused_block: bool = True
    # fused kernel for the 3 q-pool stage-transition blocks
    # (ops/fused_block.fused_transition_block). Default ON: validated on
    # chip (scripts/tpu_checks.py fwd+grad green) and the bench A/B wins
    # — tracking 38.97 vs 35.35 fps, batched decode 53.43 vs 47.51 fps
    # (v5e, interleaved runs). RGA3_FUSED_TRANSITION=0 disables for A/B.
    use_fused_transition: bool = True
    # patch embed as a 2x2 conv over a stride-4 space-to-depth image
    # instead of the raw 7x7-stride-4 conv: a 3-channel contraction maps
    # terribly onto the MXU (padded to lanes), while the rearranged
    # 2x2x48 form is a 192-wide contraction. Numerically the same conv
    # (kernel rearranged, one zero tap row/col). A/B'd on v5e (r4,
    # bench_sam2_legs, warm cache, same chip hour): tracking 38.76 vs
    # 39.08 fps, decode 52.16 vs 53.15 — the end-to-end number is a
    # small consistent LOSS (the space-to-depth gather costs more than
    # the lane-padded 3-channel contraction it removes), so the flag
    # stays OFF; the per-stage profiler that motivated it saw only the
    # embed stage in isolation. RGA3_S2D_PATCH_EMBED=1 re-enables for
    # future A/B (parity + grad tests keep the path correct).
    s2d_patch_embed: bool = False

    @property
    def depth(self) -> int:
        return sum(self.stages)

    @property
    def stage_ends(self) -> Tuple[int, ...]:
        ends = []
        total = 0
        for s in self.stages:
            total += s
            ends.append(total - 1)
        return tuple(ends)

    @property
    def q_pool_blocks(self) -> Tuple[int, ...]:
        return tuple(e + 1 for e in self.stage_ends[:-1])[: self.q_pool]

    @property
    def channel_list(self) -> Tuple[int, ...]:
        """Per-stage output dims, highest stage first (ref Hiera.channel_list)."""
        dims = []
        d = self.embed_dim
        for i in range(len(self.stages)):
            if i > 0:
                d = int(d * self.dim_mul)
            dims.append(d)
        return tuple(reversed(dims))


@dataclass(frozen=True)
class Sam2Config(ConfigBase):
    hiera: HieraConfig = field(default_factory=HieraConfig)
    # neck
    d_model: int = 256
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    scalp: int = 1  # drop lowest-res neck level
    # predictor
    image_size: int = 1024
    backbone_stride: int = 16
    num_maskmem: int = 7
    max_obj_ptrs_in_encoder: int = 16
    mem_dim: int = 64
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    directly_add_no_mem_embed: bool = True
    use_high_res_features_in_sam: bool = True
    multimask_output_in_sam: bool = True
    iou_prediction_use_sigmoid: bool = True
    use_obj_ptrs_in_encoder: bool = True
    add_tpos_enc_to_obj_ptrs: bool = False
    only_obj_ptrs_in_the_past_for_eval: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    fixed_no_obj_ptr: bool = True
    multimask_output_for_tracking: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    multimask_min_pt_num: int = 0
    multimask_max_pt_num: int = 1
    use_mlp_for_obj_ptr_proj: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    memory_temporal_stride_for_eval: int = 1
    # memory attention
    mem_attn_layers: int = 4
    mem_attn_dim_feedforward: int = 2048
    mem_attn_rope_theta: float = 10_000.0
    # mask decoder
    num_multimask_outputs: int = 3
    twoway_depth: int = 2
    twoway_mlp_dim: int = 2048
    twoway_heads: int = 8
    # losses / misc

    # Flags above that only ever take the release values (ref
    # model/sam2.py:110-128) have their behavior hard-coded in the modules;
    # validate here so flipping one raises instead of silently no-oping.
    _HARDCODED = {
        "use_high_res_features_in_sam": True,  # decoder always consumes s0/s1 skips
        "multimask_output_in_sam": True,  # call sites pass multimask for 0/1-pt prompts
        "multimask_min_pt_num": 0,
        "multimask_max_pt_num": 1,
        "multimask_output_for_tracking": True,  # video.py decodes with multimask
        "use_obj_ptrs_in_encoder": True,  # memory bank always carries ptr tokens
        "add_tpos_enc_to_obj_ptrs": False,  # obj_ptrs_to_tokens adds no temporal PE
        "only_obj_ptrs_in_the_past_for_eval": True,  # forward-only scan: inherent
        "pred_obj_scores": True,  # obj_score_token/head always built
        "pred_obj_scores_mlp": True,  # obj_score_head is a 3-layer MLP
        "fixed_no_obj_ptr": True,  # no_obj_ptr blend always applied (model.py:181)
        "use_mlp_for_obj_ptr_proj": True,  # obj_ptr_proj is a 3-layer MLP
        "directly_add_no_mem_embed": True,  # no-memory path adds no_mem_embed
    }

    def __post_init__(self) -> None:
        for name, required in self._HARDCODED.items():
            got = getattr(self, name)
            if got != required:
                raise ValueError(
                    f"Sam2Config.{name}={got!r} is not implemented: the release "
                    f"value {required!r} (ref model/sam2.py:110-128) is "
                    "hard-coded in the sam2 modules."
                )

    @property
    def feat_size(self) -> int:
        return self.image_size // self.backbone_stride

    @property
    def hidden_dim(self) -> int:
        return self.d_model


SAM2_HIERA_L = Sam2Config()


def tiny_sam2_config(image_size: int = 128) -> Sam2Config:
    """Small config for tests: 8 blocks, dim 16, same topology."""
    return Sam2Config(
        hiera=HieraConfig(
            embed_dim=16,
            num_heads=1,
            stages=(1, 2, 4, 1),
            global_att_blocks=(5,),
            window_spec=(4, 2, 4, 2),
            window_pos_embed_bkg_spatial_size=(7, 7),
        ),
        d_model=32,
        mem_dim=16,
        image_size=image_size,
        mem_attn_layers=2,
        mem_attn_dim_feedforward=64,
        twoway_mlp_dim=64,
        twoway_heads=4,
    )
