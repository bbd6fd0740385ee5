"""Rematerialization modes are numerics-neutral: loss and grads of the LM
stack are identical for remat in {none, full, dots} (they only trade HBM
for recompute FLOPs — ref train_joint.py gradient_checkpointing)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.language import QwenForCausalLM


@pytest.mark.parametrize("scan", [False, True])
@pytest.mark.slow
@pytest.mark.midlane
def test_remat_modes_same_loss_and_grads(scan):
    cfg = tiny_config().text.replace(scan_layers=scan)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(16)[None, None], (3, 2, 16))

    def run(mode):
        model = QwenForCausalLM(cfg, remat=mode)
        params = model.init(
            jax.random.PRNGKey(0), input_ids=ids, position_ids=pos
        )

        def loss(p):
            out = model.apply(p, input_ids=ids, position_ids=pos)
            return jnp.mean(out["logits"].astype(jnp.float32) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        return float(val), grads

    v_none, g_none = run("none")
    for mode in ("full", "dots", True):
        v, g = run(mode)
        assert v == pytest.approx(v_none, rel=1e-6), mode
        flat_a = jax.tree.leaves(g_none)
        flat_b = jax.tree.leaves(g)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
                err_msg=f"remat={mode}",
            )
