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
    """Linear warmup then cosine decay to a floor of min_lr_ratio * lr
    (DeepSpeed WarmupCosineLR semantics: cos_min_ratio floors the cosine
    phase only; warmup starts from 0)."""
    total = cfg.epochs * cfg.steps_per_epoch
    warmup = max(1, int(total * cfg.warmup_ratio))
    warm = optax.linear_schedule(0.0, cfg.lr, warmup)
    cosine = optax.cosine_decay_schedule(
        cfg.lr, max(1, total - warmup), alpha=cfg.min_lr_ratio
    )
    return optax.join_schedules([warm, cosine], [warmup])


def build_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    """AdamW over trainable leaves, zero updates elsewhere.

    NOTE: optax.masked alone is wrong here — it passes the raw gradients
    through for masked-out leaves, which would update frozen params.
    multi_transform routes frozen leaves to set_to_zero (and only allocates
    optimizer state for the trainable subtree)."""
    mask = trainable_mask(params)
    labels = jax.tree.map(
        lambda m: "train" if m else "freeze", mask
    )
    train_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.beta1,
            b2=cfg.beta2,
            weight_decay=cfg.weight_decay,
            mu_dtype=cfg.adam_mu_dtype,
        ),
    )
    return optax.multi_transform(
        {"train": train_tx, "freeze": optax.set_to_zero()}, labels
    )
