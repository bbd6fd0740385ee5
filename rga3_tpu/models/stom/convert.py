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


def _normalize_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        k[len("model."):] if k.startswith("model.") else k: v
        for k, v in sd.items()
    }


def infer_config_from_state_dict(sd: Dict[str, np.ndarray], base=None):
    """Derive a `CoTracker3Config` from checkpoint tensor shapes.

    Resolves the one quantity the papers don't publish — the token-feature
    concat width fed to `updateformer.input_transform` — mechanically:

      width = 2 (vis, conf) + corr_levels * corr_mlp_out
              + 2 * flow_emb_dim + (2 if flow_cat_coords else 0)

    `corr_mlp_out` comes from `corr_mlp.fc2`; with `corr_levels` held at
    its structural value the remainder has a UNIQUE (flow_emb_dim,
    flow_cat_coords) parse because the sincos embedding requires an even
    per-axis channel count (remainder % 4 == 2 -> coords appended,
    % 4 == 0 -> not). Also reads hidden size, corr radius (fc1 input =
    (2r+1)^4), fnet latent dim, virtual-track count, time/space depths,
    and the vis/conf head presence. Heads count and iteration count are
    not weight-shaped; they stay at `base`'s values.
    """
    import re

    from .cotracker3 import CoTracker3Config

    sd = _normalize_sd(sd)
    base = base or CoTracker3Config()

    hid, width = sd["updateformer.input_transform.weight"].shape
    mlp_hidden, p2 = sd["corr_mlp.fc1.weight"].shape
    mlp_out = sd["corr_mlp.fc2.weight"].shape[0]
    patch = int(round(p2 ** 0.5))          # fc1 input is patch^2
    radius = (int(round(patch ** 0.5)) - 1) // 2
    latent = sd["fnet.conv3.weight"].shape[0]
    n_virtual = sd["updateformer.virual_tracks"].shape[1]

    def depth(prefix):
        idx = {
            int(m.group(1))
            for k in sd
            for m in [re.match(rf"updateformer\.{prefix}\.(\d+)\.", k)]
            if m
        }
        return (max(idx) + 1) if idx else 0

    time_depth = depth("time_blocks")
    space_depth = depth("space_virtual_blocks")

    levels = base.corr_levels
    rem = width - 2 - levels * mlp_out
    if rem <= 0 or rem % 2:
        # structural corr_levels doesn't parse — search for one that does
        candidates = [
            lv for lv in range(1, 9)
            if (width - 2 - lv * mlp_out) > 0
            and (width - 2 - lv * mlp_out) % 2 == 0
        ]
        if not candidates:
            raise ValueError(
                f"cannot parse input_transform width {width} with "
                f"corr_mlp_out {mlp_out} for any corr_levels in 1..8"
            )
        levels = min(candidates, key=lambda lv: abs(lv - base.corr_levels))
        rem = width - 2 - levels * mlp_out
    cat_coords = rem % 4 == 2              # even flow_emb_dim forces this
    flow_emb = (rem - (2 if cat_coords else 0)) // 2

    import dataclasses

    return dataclasses.replace(
        base,
        latent_dim=latent,
        corr_levels=levels,
        corr_radius=radius,
        corr_mlp_hidden=mlp_hidden,
        corr_mlp_out=mlp_out,
        hidden_size=hid,
        num_virtual_tracks=n_virtual,
        time_depth=time_depth,
        space_depth=space_depth,
        flow_emb_dim=flow_emb,
        flow_cat_coords=cat_coords,
        linear_layer_for_vis_conf=(
            "updateformer.vis_conf_head.weight" in sd
        ),
    )


def build_cotracker3_from_state_dict(sd: Dict[str, np.ndarray], base=None):
    """State dict -> (model, params): infer the config from tensor shapes,
    build the flax module, strict-load every leaf."""
    import jax
    import jax.numpy as jnp

    from .cotracker3 import CoTracker3Offline

    sd = _normalize_sd(sd)
    cfg = infer_config_from_state_dict(sd, base=base)
    model = CoTracker3Offline(cfg)
    mh, mw = cfg.model_resolution
    shapes = jax.eval_shape(
        lambda k: model.init(
            k,
            jnp.zeros((2, mh, mw, 3), jnp.float32),
            jnp.zeros((4, 3), jnp.float32),
        ),
        jax.random.PRNGKey(0),
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    return model, load_torch_state_dict(zeros, sd)


def load_cotracker3_checkpoint(params, path: str):
    """Load `scaled_offline.pth` (torch serialized) into the JAX tree."""
    return load_torch_state_dict(params, _load_torch_sd(path))


def build_cotracker3_from_checkpoint(path: str, base=None):
    """`scaled_offline.pth` -> (model, params) with the config inferred
    from the checkpoint's own tensor shapes (see
    `infer_config_from_state_dict`)."""
    return build_cotracker3_from_state_dict(_load_torch_sd(path), base=base)


def _load_torch_sd(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(
        sd["model"], dict
    ):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items()}
