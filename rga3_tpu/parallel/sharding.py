"""Parameter/batch sharding rules (ZeRO-equivalent via the fsdp axis).

DeepSpeed ZeRO-2 shards gradients + optimizer state over data-parallel
ranks (ref: train_joint.py:297-335). The TPU-idiomatic equivalent shards
parameters AND optimizer state over the `fsdp` mesh axis and lets XLA
insert all-gathers where needed (strictly better memory than ZeRO-2).

Rules here are structural, not name-based: each parameter is sharded on its
largest divisible axis over `fsdp`. The flax logical-axis metadata from the
Qwen modules additionally maps "mlp"/"heads"/"vocab" onto `tensor` when a
tensor-parallel mesh is used.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# logical axis name -> mesh axis (flax nn.with_logical_partitioning metadata)
LOGICAL_RULES = (
    ("vocab", "tensor"),
    ("mlp", "tensor"),
    ("heads", "tensor"),
    ("embed", None),
)


def _fsdp_spec(shape, mesh: Mesh, tensor_axis: Optional[int]) -> P:
    """Shard the largest divisible dim over fsdp (skipping tensor_axis)."""
    fsdp = mesh.shape.get("fsdp", 1)
    if fsdp <= 1 or not shape:
        return P(*([None] * len(shape)))
    order = sorted(
        range(len(shape)), key=lambda i: shape[i], reverse=True
    )
    for i in order:
        if i == tensor_axis:
            continue
        if shape[i] % fsdp == 0 and shape[i] >= fsdp:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P(*([None] * len(shape)))


def infer_param_sharding(params: Any, mesh: Mesh) -> Any:
    """Build a NamedSharding pytree for a params tree.

    Uses flax logical-axis boxes when present (tensor axis), then fsdp
    sharding on the largest remaining axis.
    """
    import flax.linen as fnn
    from flax.core import meta

    tensor = mesh.shape.get("tensor", 1)
    rules = dict(LOGICAL_RULES)

    def leaf_sharding(x):
        tensor_axis = None
        names = None
        if isinstance(x, meta.Partitioned):
            names = x.names
            x = x.value
        shape = np.shape(x)
        spec = [None] * len(shape)
        if names is not None and tensor > 1:
            for i, nm in enumerate(names):
                ax = rules.get(nm)
                if ax == "tensor" and shape[i] % tensor == 0:
                    spec[i] = "tensor"
                    tensor_axis = i
                    break
        base = _fsdp_spec(shape, mesh, tensor_axis)
        for i in range(len(shape)):
            if spec[i] is None:
                spec[i] = base[i]
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(
        leaf_sharding, params,
        is_leaf=lambda x: isinstance(x, meta.Partitioned),
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device_put a params tree according to inferred shardings, unboxing
    any flax Partitioned metadata."""
    from flax.core import meta

    shardings = infer_param_sharding(params, mesh)
    unboxed = meta.unbox(params)
    return jax.tree.map(jax.device_put, unboxed, shardings)


def shard_batch_spec(mesh: Mesh) -> P:
    """Batch axis sharded over (data, fsdp) — every device gets a slice."""
    if mesh.shape.get("fsdp", 1) > 1 and mesh.shape.get("data", 1) > 1:
        return P(("data", "fsdp"))
    if mesh.shape.get("fsdp", 1) > 1:
        return P("fsdp")
    return P("data")
