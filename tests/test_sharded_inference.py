"""Tensor/FSDP-sharded INFERENCE on the virtual 8-device mesh: greedy
generation with params sharded by the logical rules must match the
unsharded result token-for-token (§2.9 — inference sharding is a
capability beyond the reference's single-GPU-per-process eval)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.config import MeshConfig
from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.generate import greedy_generate
from rga3_tpu.models.qwen25vl.model import Qwen25VL
from rga3_tpu.parallel.mesh import make_mesh
from rga3_tpu.parallel.sharding import infer_param_sharding


@pytest.mark.slow
def test_sharded_generate_matches_unsharded():
    cfg = tiny_config(vocab_size=1000)
    model = Qwen25VL(cfg)
    rng = np.random.default_rng(0)
    B, L = 2, 10
    ids = jnp.asarray(rng.integers(1, 900, (B, L)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)

    kw = dict(
        input_ids=ids,
        attention_mask=jnp.ones((B, L), jnp.int32),
        position_ids=jnp.broadcast_to(
            jnp.arange(L)[None, None], (3, B, L)
        ),
        rope_deltas=jnp.zeros((B,), jnp.int32),
        max_new_tokens=6,
        eos_token_id=999,
        pad_token_id=0,
        compute_dtype=jnp.float32,
    )
    ref = np.asarray(greedy_generate(model, params, **kw))

    mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
    from flax.core import meta

    flat = meta.unbox(params)
    shardings = infer_param_sharding(params, mesh)
    sharded = jax.tree.map(jax.device_put, flat, shardings)
    # at least one leaf actually split across the tensor axis
    n_split = sum(
        1
        for leaf in jax.tree.leaves(sharded)
        if hasattr(leaf, "sharding")
        and not leaf.sharding.is_fully_replicated
    )
    assert n_split > 0
    with mesh:
        out = np.asarray(greedy_generate(model, sharded, **kw))
    np.testing.assert_array_equal(out, ref)
