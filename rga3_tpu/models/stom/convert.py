"""Torch-checkpoint converter for CoTracker3-offline (`scaled_offline.pth`).

Maps the official `CoTrackerThreeOffline` state dict (ref:
model/STOM.py:10-21 loads it through `CoTrackerPredictor`) onto the JAX
pytree of `cotracker3.CoTracker3Offline`. The mapping is declarative and
bidirectional:

  * `flax_to_torch_key(path)` — one JAX param leaf -> official torch key;
  * `export_torch_state_dict(params)` — emit a state dict in the official
    key layout (the synthetic round-trip oracle in tests);
  * `load_torch_state_dict(params, sd)` — strict load: every checkpoint
    tensor consumed (buffers excepted), every JAX leaf filled, shapes
    verified with a loud error naming both sides.

Tensor-layout transforms: torch Linear weight (out, in) -> Dense kernel
(in, out) via transpose; torch Conv weight (O, I, kh, kw) -> flax HWIO
via (2, 3, 1, 0). Instance norms and the DiT pre-norms carry no
parameters on either side. `time_emb`/`pos_emb`-style sincos buffers are
recomputed, not loaded.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

try:  # flax tree helpers
    from flax.traverse_util import flatten_dict, unflatten_dict
except Exception:  # pragma: no cover
    flatten_dict = unflatten_dict = None

# buffers in the official checkpoint that are recomputed here
SKIPPED_TORCH_KEYS = ("time_emb", "pos_emb")


def flax_to_torch_key(path: Tuple[str, ...]) -> str:
    """('params','fnet','layer1_0','conv1','kernel') ->
    'fnet.layer1.0.conv1.weight'."""
    parts: List[str] = []
    for seg in path:
        if seg == "params":
            continue
        if seg == "kernel":
            parts.append("weight")
        elif seg == "scale":  # LayerNorm affine
            parts.append("weight")
        elif seg == "bias":
            parts.append("bias")
        elif seg.startswith("corr_mlp_fc"):
            parts.append("corr_mlp." + seg[len("corr_mlp_"):])
        else:
            # listed submodules: layer1_0 -> layer1.0, time_blocks_2 ->
            # time_blocks.2, downsample_0 -> downsample.0
            m = seg.rsplit("_", 1)
            if len(m) == 2 and m[1].isdigit() and m[0] in {
                "layer1", "layer2", "layer3", "layer4", "downsample",
                "time_blocks", "space_virtual_blocks",
                "space_point2virtual_blocks", "space_virtual2point_blocks",
            }:
                parts.append(f"{m[0]}.{m[1]}")
            else:
                parts.append(seg)
    return ".".join(parts)


def _to_torch_layout(path: Tuple[str, ...], arr: np.ndarray) -> np.ndarray:
    leaf = path[-1]
    if leaf == "kernel":
        if arr.ndim == 4:     # HWIO -> OIHW
            return np.transpose(arr, (3, 2, 0, 1))
        if arr.ndim == 2:     # (in, out) -> (out, in)
            return arr.T
    return arr


def _from_torch_layout(path: Tuple[str, ...], arr: np.ndarray,
                       target_shape: Tuple[int, ...]) -> np.ndarray:
    leaf = path[-1]
    if leaf == "kernel":
        if arr.ndim == 4:
            arr = np.transpose(arr, (2, 3, 1, 0))
        elif arr.ndim == 2:
            arr = arr.T
    if tuple(arr.shape) != tuple(target_shape):
        raise ValueError(
            f"shape mismatch at {'.'.join(path)}: checkpoint "
            f"{tuple(arr.shape)} vs model {tuple(target_shape)} — if this "
            "is input_transform, the official token-feature width differs "
            "from the reconstruction (see cotracker3.py module docstring)"
        )
    return arr


def export_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """JAX params -> official-layout state dict (numpy)."""
    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        key = flax_to_torch_key(tuple(str(p) for p in path))
        out[key] = _to_torch_layout(tuple(path), np.asarray(leaf))
    return out


def load_torch_state_dict(params, state_dict: Dict[str, np.ndarray]):
    """Strict: fills every JAX leaf from `state_dict`; raises listing any
    missing/unexpected keys."""
    sd = {
        k[len("model."):] if k.startswith("model.") else k: v
        for k, v in state_dict.items()
    }
    flat = flatten_dict(params)
    new_flat = {}
    used = set()
    missing = []
    for path, leaf in flat.items():
        key = flax_to_torch_key(tuple(str(p) for p in path))
        if key not in sd:
            missing.append(key)
            continue
        arr = np.asarray(sd[key])
        new_flat[path] = _from_torch_layout(
            tuple(path), arr, np.shape(leaf)
        ).astype(np.asarray(leaf).dtype)
        used.add(key)
    unexpected = [
        k for k in sd
        if k not in used and not any(s in k for s in SKIPPED_TORCH_KEYS)
    ]
    if missing or unexpected:
        raise KeyError(
            f"cotracker3 checkpoint mismatch: missing={missing[:10]} "
            f"(+{max(0, len(missing) - 10)} more), "
            f"unexpected={unexpected[:10]} "
            f"(+{max(0, len(unexpected) - 10)} more)"
        )
    return unflatten_dict(new_flat)


def load_cotracker3_checkpoint(params, path: str):
    """Load `scaled_offline.pth` (torch serialized) into the JAX tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(
        sd["model"], dict
    ):
        sd = sd["model"]
    sd = {k: v.numpy() for k, v in sd.items()}
    return load_torch_state_dict(params, sd)
