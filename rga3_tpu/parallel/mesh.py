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


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(data=1, fsdp=n, tensor=1)
    total = cfg.data * cfg.fsdp * cfg.tensor
    assert total == n, (
        f"mesh {cfg.data}x{cfg.fsdp}x{cfg.tensor} != {n} devices"
    )
    arr = np.asarray(devices).reshape(cfg.data, cfg.fsdp, cfg.tensor)
    return Mesh(arr, cfg.axis_names)
