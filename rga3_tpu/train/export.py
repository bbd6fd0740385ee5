"""Checkpoint export: merge LoRA into base weights and save an HF-layout
safetensors directory.

Rebuild of ref merge_lora_weights_and_save_hf_model.py (+ merge.sh's
zero_to_fp32 step, unnecessary here — Orbax state is already full fp32):
merged = W + (alpha/r) * A @ B for every q_proj/v_proj with LoRA factors,
then weights written back under the original HF names (the inverse of
loader.map_hf_key) so the result loads in either this framework or the
reference stack.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Tuple

import numpy as np


def merge_lora(params: Dict[str, Any], lora_alpha: float, lora_rank: int):
    """Fold *_lora_a/*_lora_b into their base kernels (in-place on a copy).

    params: the {"params": {...}} tree of UniGR or Qwen25VL.
    """
    import copy

    from flax.core import meta

    out = copy.deepcopy(meta.unbox(params))
    scale = lora_alpha / lora_rank

    def walk(node):
        if not isinstance(node, dict):
            return
        lora_keys = [k for k in node if k.endswith("_lora_a")]
        for ka in lora_keys:
            base_name = ka[: -len("_lora_a")]
            kb = base_name + "_lora_b"
            if kb not in node or base_name not in node:
                continue
            a = np.asarray(node[ka], np.float32)
            b = np.asarray(node[kb], np.float32)
            kernel = np.asarray(node[base_name]["kernel"], np.float32)
            node[base_name]["kernel"] = kernel + scale * (a @ b)
            del node[ka]
            del node[kb]
        for v in node.values():
            walk(v)

    walk(out["params"] if "params" in out else out)
    return out


# ---- flax path -> HF name (inverse of loader.map_hf_key) -----------------

def _flax_to_hf_qwen(path: Tuple[str, ...]):
    """Returns (hf_name, transpose_mode) or None for non-exportable leaves."""
    p = "/".join(path)
    m = re.match(r"visual/blocks_(\d+)/(.+)", p)
    if m:
        i, rest = m.groups()
        table = {
            "norm1/weight": (f"visual.blocks.{i}.norm1.weight", None),
            "norm2/weight": (f"visual.blocks.{i}.norm2.weight", None),
            "attn_qkv/kernel": (f"visual.blocks.{i}.attn.qkv.weight", "lin"),
            "attn_qkv/bias": (f"visual.blocks.{i}.attn.qkv.bias", None),
            "attn_proj/kernel": (f"visual.blocks.{i}.attn.proj.weight", "lin"),
            "attn_proj/bias": (f"visual.blocks.{i}.attn.proj.bias", None),
            "mlp_gate/kernel": (f"visual.blocks.{i}.mlp.gate_proj.weight", "lin"),
            "mlp_gate/bias": (f"visual.blocks.{i}.mlp.gate_proj.bias", None),
            "mlp_up/kernel": (f"visual.blocks.{i}.mlp.up_proj.weight", "lin"),
            "mlp_up/bias": (f"visual.blocks.{i}.mlp.up_proj.bias", None),
            "mlp_down/kernel": (f"visual.blocks.{i}.mlp.down_proj.weight", "lin"),
            "mlp_down/bias": (f"visual.blocks.{i}.mlp.down_proj.bias", None),
        }
        return table.get(rest)
    if p == "visual/patch_embed/kernel":
        return ("visual.patch_embed.proj.weight", "conv3d")
    if p == "visual/merger_ln_q/weight":
        return ("visual.merger.ln_q.weight", None)
    if p == "visual/merger_fc1/kernel":
        return ("visual.merger.mlp.0.weight", "lin")
    if p == "visual/merger_fc1/bias":
        return ("visual.merger.mlp.0.bias", None)
    if p == "visual/merger_fc2/kernel":
        return ("visual.merger.mlp.2.weight", "lin")
    if p == "visual/merger_fc2/bias":
        return ("visual.merger.mlp.2.bias", None)
    if p == "lm/embed_tokens/embedding":
        return ("model.embed_tokens.weight", None)
    if p == "lm/lm_head/kernel":
        return ("lm_head.weight", "lin")
    if p == "lm/model/norm/weight":
        return ("model.norm.weight", None)
    m = re.match(r"lm/model/layers_(\d+)/(.+)", p)
    if m:
        i, rest = m.groups()
        table = {
            "input_layernorm/weight":
                (f"model.layers.{i}.input_layernorm.weight", None),
            "post_attention_layernorm/weight":
                (f"model.layers.{i}.post_attention_layernorm.weight", None),
            "self_attn/q_proj/kernel":
                (f"model.layers.{i}.self_attn.q_proj.weight", "lin"),
            "self_attn/q_proj/bias":
                (f"model.layers.{i}.self_attn.q_proj.bias", None),
            "self_attn/k_proj/kernel":
                (f"model.layers.{i}.self_attn.k_proj.weight", "lin"),
            "self_attn/k_proj/bias":
                (f"model.layers.{i}.self_attn.k_proj.bias", None),
            "self_attn/v_proj/kernel":
                (f"model.layers.{i}.self_attn.v_proj.weight", "lin"),
            "self_attn/v_proj/bias":
                (f"model.layers.{i}.self_attn.v_proj.bias", None),
            "self_attn/o_proj/kernel":
                (f"model.layers.{i}.self_attn.o_proj.weight", "lin"),
            "mlp/gate_proj/kernel":
                (f"model.layers.{i}.mlp.gate_proj.weight", "lin"),
            "mlp/up_proj/kernel":
                (f"model.layers.{i}.mlp.up_proj.weight", "lin"),
            "mlp/down_proj/kernel":
                (f"model.layers.{i}.mlp.down_proj.weight", "lin"),
        }
        return table.get(rest)
    return None


def export_hf_safetensors(
    params: Dict[str, Any],
    out_dir: str,
    seg_head_prefix: str = "text_hidden_fcs",
) -> int:
    """Write a merged UniGR params tree as HF-layout safetensors. Returns
    the number of exported tensors. (SAM2 weights are exported under the
    reference's grounding_encoder.sam2_model.* names.)"""
    from flax.core import meta
    from safetensors.numpy import save_file

    params = meta.unbox(params)
    tree = params["params"] if "params" in params else params
    flat: Dict[str, np.ndarray] = {}

    def emit(name, arr, mode=None):
        a = np.asarray(arr, np.float32)
        if mode == "lin":
            a = a.T
        elif mode == "conv3d":
            # (I*T*H*W, O) -> (O, 3, 2, 14, 14)
            o = a.shape[1]
            a = a.T.reshape(o, 3, 2, 14, 14)
        flat[name] = np.ascontiguousarray(a)

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        if path[0] == "qwen":
            mapped = _flax_to_hf_qwen(path[1:])
            if mapped:
                emit(mapped[0], node, mapped[1])
        elif path[0] == seg_head_prefix:
            # fc1 -> text_hidden_fcs.0.0, fc2 -> text_hidden_fcs.0.2
            idx = {"fc1": "0", "fc2": "2"}[path[1]]
            kind = "weight" if path[2] == "kernel" else "bias"
            mode = "lin" if kind == "weight" else None
            emit(f"text_hidden_fcs.0.{idx}.{kind}", node, mode)
        elif path[0] == "grounding_encoder":
            # export under the reference prefix with flax->torch transposes
            name = "grounding_encoder.sam2_model." + ".".join(path[1:])
            arr = np.asarray(node, np.float32)
            if path[-1] == "kernel":
                if arr.ndim == 2:
                    name = name.replace(".kernel", ".weight")
                    arr = arr.T
                elif arr.ndim == 4:
                    name = name.replace(".kernel", ".weight")
                    arr = arr.transpose(3, 2, 0, 1)
            elif path[-1] in ("weight", "bias", "scale", "embedding",
                              "g_weight"):
                name = name.replace(".scale", ".weight")
            flat[name] = np.ascontiguousarray(arr)

    walk(tree, ())
    os.makedirs(out_dir, exist_ok=True)
    save_file(flat, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "rga3_export_manifest.json"), "w") as f:
        json.dump({"num_tensors": len(flat)}, f)
    return len(flat)
