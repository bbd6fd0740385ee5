"""Int8 weight-only quantization (the reference's optional bitsandbytes
4/8-bit inference path, TPU-native — ref:
evaluation/mevis_val_u/inference_mevis.py:70-93 `load_in_8bit`).

Weight-only, symmetric, per-output-channel: kernels are stored int8 in HBM
(halving the weight traffic that bounds KV-cached decode) and dequantized
in-register at matmul time — XLA fuses the int8->bf16 convert and the
per-column scale into the matmul epilogue. Activations stay bf16, so
quality loss is far smaller than full int8 GEMM.

Tree layout: a quantized Dense is `{kernel_q: int8 (..., in, out),
scale: f32 (..., out)}` (leading axes carry nn.scan layer stacking).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def quantize_int8(
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., in, out) float kernel -> int8 kernel + (..., out) f32 scale.
    Symmetric per-output-channel: scale = amax/127."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_matmul(
    x: jnp.ndarray, kernel_q: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """x (..., in) @ dequant(kernel_q (in, out)) -> (..., out), in x.dtype."""
    y = x @ kernel_q.astype(x.dtype)
    return y * scale.astype(x.dtype)


# Dense submodules of the LM that get quantized (q/k/v/o, MLP, lm_head).
# Embeddings (gather-only) and LoRA adapters stay in float.
QWEN_QUANT_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "lm_head",
)
# Vision-tower blocks (QwenVisionConfig.quant_int8); patch embed and the
# merger stay float.
VISION_QUANT_KEYS = (
    "attn_qkv", "attn_proj", "mlp_gate", "mlp_up", "mlp_down",
)


def quantize_qwen_params(
    params: Dict[str, Any],
    keys: Sequence[str] = QWEN_QUANT_KEYS,
    include_vision: bool = False,
) -> Dict[str, Any]:
    """Walk a QwenForCausalLM params tree and replace each targeted Dense
    `{kernel}` with `{kernel_q, scale}`. Works for both unrolled
    (`layers_i`) and scanned (`layers_scan`, stacked kernels) layouts;
    biases are kept as-is. Use with QwenTextConfig(quant_int8=True)."""
    from flax.core import meta

    params = meta.unbox(params)
    if include_vision:
        keys = tuple(keys) + VISION_QUANT_KEYS

    def walk(node, name):
        if isinstance(node, dict):
            if name in keys and "kernel" in node:
                q, scale = quantize_int8(jnp.asarray(node["kernel"]))
                out = {k: v for k, v in node.items() if k != "kernel"}
                out["kernel_q"] = q
                out["scale"] = scale
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params, "")


def dequantize_qwen_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse transform (for export / debugging): {kernel_q, scale} ->
    {kernel} float32."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node and "scale" in node:
                out = {
                    k: v for k, v in node.items()
                    if k not in ("kernel_q", "scale")
                }
                out["kernel"] = (
                    np.asarray(node["kernel_q"], np.float32)
                    * np.asarray(node["scale"], np.float32)[..., None, :]
                )
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
