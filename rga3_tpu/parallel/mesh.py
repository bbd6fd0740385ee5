"""Device mesh construction.

The reference's distributed surface is tiny: NCCL data parallelism with
DeepSpeed ZeRO-2 sharding (SURVEY.md §2.9). TPU-native mapping:
  * `data`  — batch parallelism (across DCN for multi-slice)
  * `fsdp`  — parameter/optimizer-state sharding within ICI (the
    ZeRO-equivalent axis)
  * `tensor`— megatron-style tensor parallelism for the LLM (beyond the
    reference's capabilities, available for scaling)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig


def mesh_device_array(cfg: MeshConfig, devices: Sequence) -> np.ndarray:
    """(data, fsdp, tensor) device array, DCN-topology-aware.

    On a multi-slice pod (devices carry distinct ``slice_index``), the
    collective-heavy fsdp/tensor axes must stay inside one slice's ICI and
    only the data axis (gradient all-reduce once per step) may cross the
    slow DCN links. jax's hybrid mesh helper enforces exactly that
    ordering; single-slice (or CPU/virtual) meshes keep the plain reshape.
    """
    n = len(devices)
    total = cfg.data * cfg.fsdp * cfg.tensor
    assert total == n, (
        f"mesh {cfg.data}x{cfg.fsdp}x{cfg.tensor} != {n} devices"
    )
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) > 1 and None not in slice_ids:
        n_slices = len(slice_ids)
        if cfg.data % n_slices != 0:
            raise ValueError(
                f"data axis ({cfg.data}) must be a multiple of the slice "
                f"count ({n_slices}): fsdp/tensor collectives cannot span "
                "DCN"
            )
        from jax.experimental import mesh_utils

        return mesh_utils.create_hybrid_device_mesh(
            (cfg.data // n_slices, cfg.fsdp, cfg.tensor),
            (n_slices, 1, 1),
            devices=devices,
        )
    return np.asarray(devices).reshape(cfg.data, cfg.fsdp, cfg.tensor)


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if cfg is None:
        # default: pure fsdp within a slice; on a multi-slice pod the
        # data axis takes the slice count (fsdp must not span DCN)
        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        n_slices = (
            len(slice_ids) if None not in slice_ids and slice_ids else 1
        )
        cfg = MeshConfig(
            data=n_slices, fsdp=len(devices) // n_slices, tensor=1
        )
    return Mesh(mesh_device_array(cfg, devices), cfg.axis_names)
