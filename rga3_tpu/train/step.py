"""Sharded train step: pjit over the (data, fsdp, tensor) mesh with
gradient accumulation as a `lax.scan` over micro-batches.

Replaces the reference's DeepSpeed engine loop (ref: train_joint.py:500-535
— micro-bs x accum with ZeRO-2 reduce-scatter/all-gather). Here the mesh
sharding of params/optimizer state is the ZeRO equivalent; XLA inserts the
collectives over ICI.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..parallel.sharding import infer_param_sharding, shard_batch_spec
from .optimizer import build_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_state(
    cfg: TrainConfig, params: Any, mesh: Optional[Mesh] = None
) -> tuple[TrainState, optax.GradientTransformation]:
    from flax.core import meta

    # sharding metadata is consumed by infer_param_sharding; strip the
    # LogicallyPartitioned boxes so optimizer/update trees are plain arrays
    sharding_source = params
    params = meta.unbox(params)
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    if mesh is not None:
        # infer_param_sharding maps any pytree leaf -> NamedSharding, so it
        # applies to the optimizer state (mu/nu mirror params; scalars get
        # a replicated P()).
        psh = jax.tree.map(
            lambda s: s,
            infer_param_sharding(sharding_source, mesh),
        )
        params = jax.tree.map(jax.device_put, params, psh)
        opt_sh = infer_param_sharding(opt_state, mesh)
        opt_state = jax.tree.map(jax.device_put, opt_state, opt_sh)
        state = TrainState(
            params,
            opt_state,
            jax.device_put(state.step, NamedSharding(mesh, P())),
        )
    return state, tx


def build_train_step(
    loss_fn: Callable[[Any, Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]],
    tx: optax.GradientTransformation,
    grad_accum_steps: int = 1,
    donate: bool = True,
):
    """loss_fn(params, batch) -> dict with 'loss' (+ aux scalars).

    The returned step takes (state, batch) where every array in `batch` has
    a leading micro-step axis of length grad_accum_steps (axis 0) and a
    batch axis (axis 1) sharded over the mesh.
    """

    def micro_grads(params, micro_batch):
        def scalar_loss(p):
            out = loss_fn(p, micro_batch)
            return out["loss"], out

        grads, aux = jax.grad(scalar_loss, has_aux=True)(params)
        return grads, aux

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        params = state.params

        if grad_accum_steps == 1:
            grads, aux = micro_grads(
                params, jax.tree.map(lambda x: x[0], batch)
            )
        else:
            def accum(carry, micro_batch):
                g_acc = carry
                g, aux = micro_grads(params, micro_batch)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return g_acc, aux

            zeros = jax.tree.map(jnp.zeros_like, params)
            grads, auxes = jax.lax.scan(accum, zeros, batch)
            grads = jax.tree.map(
                lambda g: g / grad_accum_steps, grads
            )
            aux = jax.tree.map(lambda x: x[-1], auxes)

        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        return new_state, aux

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
