"""Qwen2.5-VL architecture configs (JAX rebuild of the external HF dependency,
SURVEY.md §2.3; ref loads it via `transformers` at train_joint.py:176-185).

Presets match the released `Qwen2.5-VL-{3B,7B}-Instruct` HF configs so the
UniGR checkpoints load unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

from ...config import ConfigBase

# Special token ids (Qwen2.5 tokenizer)
IM_START_TOKEN_ID = 151644  # <|im_start|>
IM_END_TOKEN_ID = 151645  # <|im_end|>
ENDOFTEXT_TOKEN_ID = 151643  # <|endoftext|>
VISION_START_TOKEN_ID = 151652  # <|vision_start|>
VISION_END_TOKEN_ID = 151653  # <|vision_end|>
IMAGE_PAD_TOKEN_ID = 151655  # <|image_pad|>
VIDEO_PAD_TOKEN_ID = 151656  # <|video_pad|>


@dataclass(frozen=True)
class QwenVisionConfig(ConfigBase):
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    tokens_per_second: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    out_hidden_size: int = 3584
    rms_norm_eps: float = 1e-6
    # compile the tower as nn.scan over one stacked block; full-attention
    # blocks are selected by a scanned per-block boolean (window/full
    # attention differ only in which segment-id vector they use)
    scan_blocks: bool = False
    # int8 weight-only vision blocks (patch embed + merger stay float);
    # convert trees with ops.quant.quantize_qwen_params(include_vision=True)
    quant_int8: bool = False
    # W8A8 for the vision blocks (see QwenTextConfig.quant_w8a8)
    quant_w8a8: bool = False
    # keep tokens in PADDED window order across the whole block stack:
    # one pad gather in, one unpad gather out, zero per-block gathers
    # (the win_pad/win_unpad gathers were the r3 hot spot); every block
    # computes on Lp >= L tokens (pad slots ride in masked lanes), full
    # attention runs over the padded stream with pad segment id -1
    window_resident: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2


@dataclass(frozen=True)
class QwenTextConfig(ConfigBase):
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    tie_word_embeddings: bool = False
    # HF checkpoint metadata only: sequence length here is bounded by the
    # static shapes of each jitted call, not by a config ceiling
    max_position_embeddings: int = 128000
    # LoRA over q_proj/v_proj (ref: train_joint.py:193-232, r=128 α=256 in
    # the release run — run_torchrun.sh:30-31). 0 disables.
    lora_rank: int = 0
    lora_alpha: float = 0.0
    # compile the decoder as nn.scan over one stacked layer (28x smaller
    # XLA graph for 7B — critical on slow-compile backends); params live
    # under "layers_scan" with a leading layer axis (see
    # loader.stack_qwen_layers)
    scan_layers: bool = False
    # int8 weight-only inference (the reference's optional bitsandbytes
    # path, ref inference_mevis.py:70-93). Dense kernels become
    # {kernel_q int8, scale f32}; convert trees with
    # ops.quant.quantize_qwen_params.
    quant_int8: bool = False
    # int4 weight-only (the reference's `load_in_4bit` leg of the same
    # path): nibble-packed kernels {kernel_q4 int8, scale_g f32} with
    # group-32 input-dim scales (ops.quant.INT4_GROUP); convert with
    # ops.quant.quantize_qwen_params(bits=4). Mutually exclusive with
    # quant_int8.
    quant_int4: bool = False
    # int8 KV cache (beyond the reference): K/V stored as int8 with a
    # per-(position, kv-head) f32 scale, dequantized inside the decode
    # attention. Halves the cache's share of decode HBM traffic — at the
    # serving batch the KV stream is ~25% of the weight stream. Prefill
    # math is untouched (flash runs on the raw bf16 K/V; only the stored
    # copy is quantized).
    kv_cache_int8: bool = False
    # W8A8 prefill (requires quant_int8): multi-token calls quantize
    # activations per token and run native s8xs8->s32 MXU dots (2x the
    # bf16 FLOP rate on v5e); single-token decode stays weight-only.
    # ~0.4%/matmul quant error on Gaussian activations — validate
    # end-task quality on real weights before production use.
    quant_w8a8: bool = False


@dataclass(frozen=True)
class Qwen25VLConfig(ConfigBase):
    vision: QwenVisionConfig = field(default_factory=QwenVisionConfig)
    text: QwenTextConfig = field(default_factory=QwenTextConfig)
    image_token_id: int = IMAGE_PAD_TOKEN_ID
    video_token_id: int = VIDEO_PAD_TOKEN_ID
    vision_start_token_id: int = VISION_START_TOKEN_ID


QWEN25_VL_7B = Qwen25VLConfig(
    vision=QwenVisionConfig(out_hidden_size=3584),
    text=QwenTextConfig(
        vocab_size=152064,
        hidden_size=3584,
        intermediate_size=18944,
        num_hidden_layers=28,
        num_attention_heads=28,
        num_key_value_heads=4,
        tie_word_embeddings=False,
    ),
)

QWEN25_VL_3B = Qwen25VLConfig(
    vision=QwenVisionConfig(out_hidden_size=2048),
    text=QwenTextConfig(
        vocab_size=151936,
        hidden_size=2048,
        intermediate_size=11008,
        num_hidden_layers=36,
        num_attention_heads=16,
        num_key_value_heads=2,
        tie_word_embeddings=True,
    ),
)


def tiny_config(vocab_size: int = 160_000) -> Qwen25VLConfig:
    """Small config with real special-token ids for fast tests."""
    return Qwen25VLConfig(
        vision=QwenVisionConfig(
            depth=4,
            hidden_size=64,
            intermediate_size=128,
            num_heads=4,
            window_size=28,  # 2 merged patches per window side
            fullatt_block_indexes=(1, 3),
            out_hidden_size=64,
        ),
        text=QwenTextConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            mrope_section=(2, 3, 3),
            tie_word_embeddings=False,
        ),
    )
