"""Optimizer: AdamW + warmup-cosine-with-floor, trainability masking.

Mirrors the reference's DeepSpeed config (ref: train_joint.py:297-335 —
AdamW lr 4e-5 betas (0.9, 0.95), WarmupCosineLR with 3% warmup and 0.03
floor, grad clip 1.0) and its trainability surface (ref :237-251): LoRA
params + lm_head + embed_tokens + SAM2 mask decoder + text_hidden_fcs; the
visual tower and the rest of SAM2 stay frozen (ref :190-191, sam2
freeze at qwen_2_5_vl_sam2.py:120-126).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import optax

from ..config import TrainConfig

DEFAULT_TRAINABLE_PATTERNS: Tuple[str, ...] = (
    "lora_a",
    "lora_b",
    "lm_head",
    "embed_tokens",
    "sam_mask_decoder",
    "text_hidden_fcs",
)


def trainable_mask(
    params: Any, patterns: Sequence[str] = DEFAULT_TRAINABLE_PATTERNS
) -> Any:
    """Pytree of bools: True where any pattern appears in the param path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return "/".join(
            getattr(k, "key", getattr(k, "idx", str(k)))
            if isinstance(getattr(k, "key", None), str)
            else str(getattr(k, "key", k))
            for k in path
        )

    def mask_tree(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: mask_tree(v, f"{prefix}/{k}") for k, v in tree.items()
            }
        return any(p in prefix for p in patterns)

    return mask_tree(params)


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    total = cfg.epochs * cfg.steps_per_epoch
    warmup = max(1, int(total * cfg.warmup_ratio))
    floor = cfg.lr * cfg.min_lr_ratio

    warm = optax.linear_schedule(0.0, cfg.lr, warmup)
    cosine = optax.cosine_decay_schedule(
        cfg.lr, max(1, total - warmup), alpha=cfg.min_lr_ratio
    )
    sched = optax.join_schedules([warm, cosine], [warmup])

    def clipped(step):
        import jax.numpy as jnp

        return jnp.maximum(sched(step), floor)

    return clipped


def build_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    mask = trainable_mask(params)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.beta1,
            b2=cfg.beta2,
            weight_decay=cfg.weight_decay,
        ),
    )
    return optax.masked(tx, mask)
