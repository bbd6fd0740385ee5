"""Qwen2.5-VL / UniGR HF checkpoint loader: safetensors -> flax params.

Maps the released `Qwen2.5-VL-{3B,7B}-Instruct` / `SurplusDeficit/UniGR-7B`
HF weight names onto the rga3_tpu pytree (required by the north star:
"UniGR HF checkpoints load unchanged" — BASELINE.md). UniGR checkpoints
additionally carry `grounding_encoder.sam2_model.*` (mapped via the SAM2
loader) and `text_hidden_fcs.0.{0,2}.*` (the projection head,
ref model/qwen_2_5_vl_sam2.py:131-140).

Host-side numpy only.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np


def _lin(w):
    return np.transpose(w, (1, 0))


def iter_safetensors(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors in {model_dir}")
    for fname in files:
        with safe_open(
            os.path.join(model_dir, fname), framework="np"
        ) as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def iter_torch_bin(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Fallback for merged UniGR dirs saved as pytorch_model-*.bin."""
    import torch

    index = os.path.join(model_dir, "pytorch_model.bin.index.json")
    if os.path.exists(index):
        with open(index) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
    else:
        shards = [
            f for f in os.listdir(model_dir)
            if f.startswith("pytorch_model") and f.endswith(".bin")
        ]
    for shard in shards:
        sd = torch.load(
            os.path.join(model_dir, shard), map_location="cpu",
            weights_only=True,
        )
        for k, v in sd.items():
            yield k, v.float().numpy()


def _set(tree: Dict[str, Any], path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def map_hf_key(key: str) -> Optional[Tuple[str, bool]]:
    """HF weight name -> (flax path under the Qwen25VL module, transpose?).

    Returns None for keys handled elsewhere (SAM2, seg head) or ignored.
    Handles both bare Qwen2.5-VL names and UniGR's (same names; the SAM2
    tree lives under grounding_encoder.sam2_model).
    """
    k = key
    # strip possible "model." prefix variants used by newer transformers
    k = re.sub(r"^model\.language_model\.", "model.", k)
    k = re.sub(r"^model\.visual\.", "visual.", k)

    # ---- vision tower
    m = re.match(r"visual\.patch_embed\.proj\.weight$", k)
    if m:
        # Conv3d (O, I, T, H, W) -> flattened matmul (I*T*H*W, O)
        return "visual/patch_embed/kernel", "conv3d"
    m = re.match(r"visual\.blocks\.(\d+)\.(.+)$", k)
    if m:
        i, rest = m.group(1), m.group(2)
        base = f"visual/blocks_{i}"
        table = {
            "norm1.weight": (f"{base}/norm1/weight", False),
            "norm2.weight": (f"{base}/norm2/weight", False),
            "attn.qkv.weight": (f"{base}/attn_qkv/kernel", True),
            "attn.qkv.bias": (f"{base}/attn_qkv/bias", False),
            "attn.proj.weight": (f"{base}/attn_proj/kernel", True),
            "attn.proj.bias": (f"{base}/attn_proj/bias", False),
            "mlp.gate_proj.weight": (f"{base}/mlp_gate/kernel", True),
            "mlp.gate_proj.bias": (f"{base}/mlp_gate/bias", False),
            "mlp.up_proj.weight": (f"{base}/mlp_up/kernel", True),
            "mlp.up_proj.bias": (f"{base}/mlp_up/bias", False),
            "mlp.down_proj.weight": (f"{base}/mlp_down/kernel", True),
            "mlp.down_proj.bias": (f"{base}/mlp_down/bias", False),
        }
        return table.get(rest)
    if k == "visual.merger.ln_q.weight":
        return "visual/merger_ln_q/weight", False
    m = re.match(r"visual\.merger\.mlp\.(\d)\.(weight|bias)$", k)
    if m:
        idx = {"0": "merger_fc1", "2": "merger_fc2"}[m.group(1)]
        t = m.group(2) == "weight"
        return f"visual/{idx}/{'kernel' if t else 'bias'}", t

    # ---- language model
    if k == "model.embed_tokens.weight":
        return "lm/embed_tokens/embedding", False
    if k == "lm_head.weight":
        return "lm/lm_head/kernel", True
    if k == "model.norm.weight":
        return "lm/model/norm/weight", False
    m = re.match(r"model\.layers\.(\d+)\.(.+)$", k)
    if m:
        i, rest = m.group(1), m.group(2)
        base = f"lm/model/layers_{i}"
        table = {
            "input_layernorm.weight": (f"{base}/input_layernorm/weight", False),
            "post_attention_layernorm.weight": (
                f"{base}/post_attention_layernorm/weight", False),
            "self_attn.q_proj.weight": (f"{base}/self_attn/q_proj/kernel", True),
            "self_attn.q_proj.bias": (f"{base}/self_attn/q_proj/bias", False),
            "self_attn.k_proj.weight": (f"{base}/self_attn/k_proj/kernel", True),
            "self_attn.k_proj.bias": (f"{base}/self_attn/k_proj/bias", False),
            "self_attn.v_proj.weight": (f"{base}/self_attn/v_proj/kernel", True),
            "self_attn.v_proj.bias": (f"{base}/self_attn/v_proj/bias", False),
            "self_attn.o_proj.weight": (f"{base}/self_attn/o_proj/kernel", True),
            "mlp.gate_proj.weight": (f"{base}/mlp/gate_proj/kernel", True),
            "mlp.up_proj.weight": (f"{base}/mlp/up_proj/kernel", True),
            "mlp.down_proj.weight": (f"{base}/mlp/down_proj/kernel", True),
        }
        return table.get(rest)
    return None


def stack_qwen_layers(
    params: Dict[str, Any], stack_vision: bool = False
) -> Dict[str, Any]:
    """Convert per-layer params into the stacked layouts used by
    scan_layers=True (lm/model/layers_scan/layer/...) and, optionally,
    scan_blocks=True (visual/blocks_scan/block/...)."""
    import copy

    from flax.core import meta

    out = copy.deepcopy(meta.unbox(params))
    tree = out["params"] if "params" in out else out
    model = tree["lm"]["model"] if "lm" in tree else tree["model"]
    layer_keys = sorted(
        (k for k in model if k.startswith("layers_") and k != "layers_scan"),
        key=lambda k: int(k.split("_")[1]),
    )
    if layer_keys:
        stacked = jax_tree_stack([model.pop(k) for k in layer_keys])
        model["layers_scan"] = {"layer": stacked}
    if stack_vision and "visual" in tree:
        vis = tree["visual"]
        block_keys = sorted(
            (k for k in vis
             if k.startswith("blocks_") and k != "blocks_scan"),
            key=lambda k: int(k.split("_")[1]),
        )
        if block_keys:
            stacked = jax_tree_stack([vis.pop(k) for k in block_keys])
            vis["blocks_scan"] = {"block": stacked}
    return out


def jax_tree_stack(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def load_qwen25vl_params(
    model_dir: str, dtype=np.float32
) -> Dict[str, Any]:
    """Load a Qwen2.5-VL HF dir into a {"params": ...} tree for Qwen25VL."""
    tree: Dict[str, Any] = {}
    try:
        items = iter_safetensors(model_dir)
    except FileNotFoundError:
        items = iter_torch_bin(model_dir)
    for key, val in items:
        mapped = map_hf_key(key)
        if mapped is None:
            continue
        path, t = mapped
        if t == "conv3d":
            o = val.shape[0]
            val = val.reshape(o, -1).T  # (I*T*H*W, O)
        elif t:
            val = _lin(val)
        _set(tree, path, val.astype(dtype))
    return {"params": tree}


def load_unigr_params(
    model_dir: str, dtype=np.float32
) -> Dict[str, Any]:
    """Load a merged UniGR HF dir into a {"params": ...} tree for UniGR:
    qwen/* + grounding_encoder/* + text_hidden_fcs/*."""
    from ..sam2.loader import convert_sam2_checkpoint

    qwen_tree: Dict[str, Any] = {}
    sam_sd: Dict[str, np.ndarray] = {}
    seg_tree: Dict[str, Any] = {}
    try:
        items = iter_safetensors(model_dir)
    except FileNotFoundError:
        items = iter_torch_bin(model_dir)
    for key, val in items:
        val = np.asarray(val)
        if key.startswith("grounding_encoder.sam2_model."):
            sk = key[len("grounding_encoder.sam2_model."):]
            sam_sd[sk.replace(".gamma", ".g_weight")] = val.astype(np.float32)
            continue
        m = re.match(r"text_hidden_fcs\.0\.(\d)\.(weight|bias)$", key)
        if m:
            fc = {"0": "fc1", "2": "fc2"}[m.group(1)]
            if m.group(2) == "weight":
                _set(seg_tree, f"{fc}/kernel", _lin(val).astype(dtype))
            else:
                _set(seg_tree, f"{fc}/bias", val.astype(dtype))
            continue
        mapped = map_hf_key(key)
        if mapped is None:
            continue
        path, t = mapped
        if t == "conv3d":
            o = val.shape[0]
            val = val.reshape(o, -1).T
        elif t:
            val = _lin(val)
        _set(qwen_tree, path, val.astype(dtype))

    params = {"qwen": qwen_tree, "text_hidden_fcs": seg_tree}
    if sam_sd:
        params["grounding_encoder"] = convert_sam2_checkpoint(sam_sd)
    return {"params": params}
