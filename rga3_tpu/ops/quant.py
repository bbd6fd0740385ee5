"""Int8/int4 weight-only quantization (the reference's optional
bitsandbytes 4/8-bit inference path, TPU-native — ref:
evaluation/mevis_val_u/inference_mevis.py:70-93 `load_in_8bit` /
`load_in_4bit`).

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


# ---------------------------------------------------------------------------
# Int4 weight-only (the reference's `load_in_4bit` counterpart): two
# nibbles packed per int8 byte along the input dim, symmetric [-7, 7]
# with group-wise scales (per-output-channel int4 loses too much; the
# group dim rides the input axis like GPTQ/bnb blockwise scales).
# ---------------------------------------------------------------------------

INT4_GROUP = 32  # input-dim rows per scale group (the llama.cpp Q4_0
# blocksize; measured ~15% lower output error than group-128 on Gaussian
# weights at 0.125 extra bytes/weight of f32 scales)


def int4_group(in_dim: int) -> int:
    """Scale-group size for a given input dim: 32 when it divides,
    otherwise the whole dim (per-channel) — must match between
    quantize-time and apply-time."""
    return INT4_GROUP if in_dim % INT4_GROUP == 0 else in_dim


def quantize_int4(
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., in, out) float kernel -> packed int4 (..., in//2, out) +
    (..., in//group, out) f32 group scales. in must be even."""
    *lead, in_dim, out = w.shape
    g = int4_group(in_dim)
    wf = w.astype(jnp.float32).reshape(*lead, in_dim // g, g, out)
    amax = jnp.max(jnp.abs(wf), axis=-2)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(
        jnp.round(wf / scale[..., None, :]), -7, 7
    ).astype(jnp.int8).reshape(*lead, in_dim, out)
    # pack row pairs: even row -> low nibble, odd row -> high nibble
    pairs = q.reshape(*lead, in_dim // 2, 2, out)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(pairs[..., 0, :], 15),
        jnp.left_shift(pairs[..., 1, :], 4),
    ).astype(jnp.int8)
    return packed, scale.astype(jnp.float32)


def int4_matmul(
    x: jnp.ndarray, kernel_q4: jnp.ndarray, scale_g: jnp.ndarray
) -> jnp.ndarray:
    """x (..., in) @ dequant(packed (in//2, out), scales (groups, out)).
    Unpack + group-scale are elementwise producers XLA fuses into the
    dot operand — HBM reads stay at the packed int4 + scale bytes."""
    half, out = kernel_q4.shape[-2:]
    in_dim = half * 2
    g = int4_group(in_dim)
    low = jnp.right_shift(jnp.left_shift(kernel_q4, 4), 4)  # arithmetic
    high = jnp.right_shift(kernel_q4, 4)  # sign-extends
    w = jnp.stack([low, high], axis=-2).reshape(
        *kernel_q4.shape[:-2], in_dim, out
    )
    wf = w.astype(x.dtype).reshape(
        *kernel_q4.shape[:-2], in_dim // g, g, out
    ) * scale_g[..., None, :].astype(x.dtype)
    return x @ wf.reshape(*kernel_q4.shape[:-2], in_dim, out)


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
    bits: int = 8,
) -> Dict[str, Any]:
    """Walk a QwenForCausalLM params tree and replace each targeted Dense
    `{kernel}` with `{kernel_q, scale}` (bits=8) or `{kernel_q4, scale_g}`
    (bits=4). Works for both unrolled (`layers_i`) and scanned
    (`layers_scan`, stacked kernels) layouts; biases are kept as-is. Use
    with QwenTextConfig(quant_int8=True) / (quant_int4=True)."""
    from flax.core import meta

    assert bits in (4, 8), bits
    params = meta.unbox(params)
    if include_vision:
        keys = tuple(keys) + VISION_QUANT_KEYS

    def walk(node, name):
        if isinstance(node, dict):
            if name in keys and "kernel" in node:
                out = {k: v for k, v in node.items() if k != "kernel"}
                if bits == 8:
                    q, scale = quantize_int8(jnp.asarray(node["kernel"]))
                    out["kernel_q"] = q
                    out["scale"] = scale
                else:
                    q4, sg = quantize_int4(jnp.asarray(node["kernel"]))
                    out["kernel_q4"] = q4
                    out["scale_g"] = sg
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params, "")


def quantize_for_serving(
    qwen_params: Dict[str, Any], mode: str
) -> Dict[str, Any]:
    """One-call serving transform for a Qwen(VL) subtree.

    mode "int8": int8 LM + int8 vision tower. mode "int4": int4 LM +
    int8 vision tower (the LM weights dominate decode HBM traffic;
    vision stays int8 for quality). Matches QwenTextConfig
    quant_int8/quant_int4 + QwenVisionConfig quant_int8."""
    if mode == "int8":
        return quantize_qwen_params(qwen_params, include_vision=True)
    assert mode == "int4", mode
    p8 = quantize_qwen_params(qwen_params, keys=VISION_QUANT_KEYS, bits=8)
    return quantize_qwen_params(p8, keys=QWEN_QUANT_KEYS, bits=4)


QUANT_CKPT_FILE = "rga3_quant.safetensors"
QUANT_CKPT_META = "rga3_quant.json"


def save_quantized(params: Dict[str, Any], out_dir: str, meta: Dict) -> str:
    """Persist an (already-quantized) params tree as one safetensors file
    + a meta json. Cold-start then reads int8/int4 kernels directly —
    no full-precision weights travel host->device (the slow hop on
    tunneled TPU setups), and disk shrinks accordingly."""
    import json
    import os

    import numpy as np
    from safetensors.numpy import save_file

    flat: Dict[str, Any] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for kk, vv in node.items():
                walk(vv, path + (kk,))
            return
        flat["/".join(path)] = np.asarray(node)

    walk(params, ())
    os.makedirs(out_dir, exist_ok=True)
    save_file(flat, os.path.join(out_dir, QUANT_CKPT_FILE))
    with open(os.path.join(out_dir, QUANT_CKPT_META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def is_quantized_dir(model_dir: str) -> bool:
    import os

    return os.path.exists(os.path.join(model_dir, QUANT_CKPT_FILE))


def load_quantized(model_dir: str) -> Tuple[Dict[str, Any], Dict]:
    """Inverse of save_quantized: (nested params tree, meta)."""
    import json
    import os

    from safetensors import safe_open

    tree: Dict[str, Any] = {}
    with safe_open(
        os.path.join(model_dir, QUANT_CKPT_FILE), framework="numpy"
    ) as f:
        for key in f.keys():
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = f.get_tensor(key)
    with open(os.path.join(model_dir, QUANT_CKPT_META)) as f:
        meta = json.load(f)
    return tree, meta


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
            if "kernel_q4" in node and "scale_g" in node:
                out = {
                    k: v for k, v in node.items()
                    if k not in ("kernel_q4", "scale_g")
                }
                p = np.asarray(node["kernel_q4"], np.int8)
                low = np.right_shift(np.left_shift(p, 4), 4)
                high = np.right_shift(p, 4)
                *lead, half, o = p.shape
                in_dim = half * 2
                w = np.stack([low, high], axis=-2).reshape(
                    *lead, in_dim, o
                ).astype(np.float32)
                g = int4_group(in_dim)
                sg = np.asarray(node["scale_g"], np.float32)
                out["kernel"] = (
                    w.reshape(*lead, in_dim // g, g, o) * sg[..., None, :]
                ).reshape(*lead, in_dim, o)
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
