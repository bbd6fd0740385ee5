"""Typed configuration system.

Replaces the reference's argparse sprawl (ref: train_joint.py:38-124, every
evaluation/*/inference_*.py re-declaring flags) with frozen dataclasses that
serialize to/from JSON. One config object per subsystem; presets for the
released model sizes live next to the model code
(`rga3_tpu.models.qwen25vl.config`, `rga3_tpu.models.sam2.config`).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


def _asdict(obj) -> Dict[str, Any]:
    return dataclasses.asdict(obj)


class ConfigBase:
    """JSON (de)serialization shared by all configs."""

    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]):
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in names:
                continue
            f = next(f for f in dataclasses.fields(cls) if f.name == k)
            if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
                kwargs[k] = f.type.from_dict(v)  # type: ignore[union-attr]
            else:
                kwargs[k] = v
        return cls(**kwargs)  # type: ignore[call-arg]

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


@dataclass(frozen=True)
class SegHeadConfig(ConfigBase):
    """[SEG]-token projection head + loss weights.

    Mirrors UniGRConfig extras (ref: model/qwen_2_5_vl_sam2.py:82-101).
    """

    out_dim: int = 256
    ce_loss_weight: float = 1.0
    dice_loss_weight: float = 0.5
    bce_loss_weight: float = 2.0
    dice_scale: float = 1000.0
    train_mask_decoder: bool = True
    # The reference always freezes the SAM2 image encoder (trunk + neck;
    # ref qwen_2_5_vl_sam2.py:120-126). When True, train_forward cuts the
    # gradient at that boundary so XLA never builds the trunk backward
    # pass (~2x the 1024² Hiera-L forward FLOPs, all discarded by the
    # optimizer mask). Set False ONLY if the trunk is added to the
    # optimizer's trainable patterns.
    freeze_sam_backbone: bool = True
    # resolved at tokenizer build time; -1 = unset
    seg_token_id: int = -1


@dataclass(frozen=True)
class MeshConfig(ConfigBase):
    """Device mesh layout. ZeRO-2-equivalent = shard optimizer state and
    gradients over the `fsdp` axis while keeping params replicated (or fully
    sharded for fsdp>1). Ref parallelism surface: SURVEY.md §2.9."""

    data: int = 1  # dp axis (across DCN for multi-slice)
    fsdp: int = 1  # ZeRO-style sharding axis (within ICI)
    tensor: int = 1  # tp axis for the LLM (megatron-style sharding)

    @property
    def axis_names(self) -> Tuple[str, str, str]:
        return ("data", "fsdp", "tensor")


@dataclass(frozen=True)
class TrainConfig(ConfigBase):
    """Training hyperparameters (ref defaults: run_torchrun.sh:14-49,
    train_joint.py:297-335)."""

    lr: float = 4e-5
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    min_lr_ratio: float = 0.03  # cosine floor
    grad_clip: float = 1.0
    epochs: int = 80
    steps_per_epoch: int = 100
    micro_batch_size: int = 2
    grad_accum_steps: int = 8
    precision: str = "bfloat16"
    # dtype of Adam's first moment. bf16 halves that slice of optimizer
    # HBM (useful headroom at scale); the variance stays f32 — bf16's
    # 8-bit mantissa is too coarse for second moments. "float32" for the
    # reference-exact regime.
    adam_mu_dtype: str = "float32"
    lora_r: int = 128
    lora_alpha: int = 256
    lora_dropout: float = 0.05
    lora_target_modules: Tuple[str, ...] = ("q_proj", "v_proj")
    # modules with full fine-tuning on top of LoRA
    # (ref: train_joint.py:237-251)
    trainable_modules: Tuple[str, ...] = (
        "lm_head",
        "embed_tokens",
        "sam_mask_decoder",
        "text_hidden_fcs",
    )
    num_frames_mllm: int = 8
    num_frames_sam: int = 4
    seed: int = 42
    auto_resume: bool = True
    ckpt_dir: str = "runs/default"
    # LM activation strategy: "full" recomputes whole decoder layers in
    # the backward (least HBM), "dots" saves weight-matmul outputs and
    # recomputes only norms/rope/elementwise, "none" stores everything.
    # Chip A/B at the release micro-batch (3B+vision, seq 512, 2 SAM
    # frames, micro-bs 2): dots 291.9 ms/step (MFU 0.414) vs none 307.2
    # (0.393) vs full ~328 (0.36 extrapolated from b1 183.1/172.0) —
    # dots is the default; presets can set "full" when HBM-bound.
    # bool accepted for compat (True -> "full", False -> "none").
    remat: Any = "dots"


@dataclass(frozen=True)
class DataConfig(ConfigBase):
    """Dataset mixture (ref: run_torchrun.sh:43-49 two parallel comma lists)."""

    dataset_dir: str = "./data"
    datasets: Tuple[str, ...] = ("sem_seg", "refer_seg", "vqa", "reason_seg")
    sample_rates: Tuple[float, ...] = (9.0, 3.0, 3.0, 1.0)
    video_max_pixels: int = 320 * 28 * 28
    image_max_pixels: int = 1280 * 28 * 28
    min_pixels: int = 4 * 28 * 28
    num_workers: int = 4


@dataclass(frozen=True)
class GenerationConfig(ConfigBase):
    max_new_tokens: int = 128
    temperature: float = 0.0  # 0 = greedy
    top_p: float = 1.0
    eos_token_id: int = 151645  # <|im_end|>
    pad_token_id: int = 151643  # <|endoftext|>


@dataclass(frozen=True)
class RuntimeConfig(ConfigBase):
    """Top-level runtime switches."""

    mesh: MeshConfig = field(default_factory=MeshConfig)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    log_every: int = 10
