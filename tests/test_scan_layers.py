"""scan_layers decoder == per-layer loop decoder (same weights)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.language import QwenForCausalLM, make_kv_cache
from rga3_tpu.models.qwen25vl.loader import stack_qwen_layers


@pytest.mark.slow
def test_scan_matches_loop_and_cache_decode():
    cfg = tiny_config(vocab_size=300).text
    loop_model = QwenForCausalLM(cfg)
    scan_model = QwenForCausalLM(cfg.replace(scan_layers=True))
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 300, (2, 9)), jnp.int32
    )
    params = loop_model.init(jax.random.PRNGKey(0), input_ids=ids)
    stacked = stack_qwen_layers({"params": {"lm": params["params"]}})
    stacked = {"params": stacked["params"]["lm"]}

    out_loop = loop_model.apply(params, input_ids=ids)["logits"]
    out_scan = scan_model.apply(stacked, input_ids=ids)["logits"]
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=2e-4, atol=2e-4
    )

    # cached decode parity under scan
    cache = make_kv_cache(cfg, batch=2, max_len=12, dtype=jnp.float32)
    o = scan_model.apply(stacked, input_ids=ids[:, :6], cache=cache)
    cache2 = o["cache"]
    logits = [o["logits"]]
    for t in range(6, 9):
        o = scan_model.apply(
            stacked, input_ids=ids[:, t : t + 1], cache=cache2
        )
        cache2 = o["cache"]
        logits.append(o["logits"])
    stepped = jnp.concatenate(logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(out_loop), rtol=2e-4, atol=2e-4
    )


def test_vision_scan_blocks_matches_loop():
    from rga3_tpu.models.qwen25vl.vision import (
        QwenVisionTower, compute_vision_layout, layout_device_args,
    )

    base_cfg = tiny_config(vocab_size=300).vision
    loop_tower = QwenVisionTower(base_cfg)
    scan_tower = QwenVisionTower(base_cfg.replace(scan_blocks=True))
    rng = np.random.default_rng(0)
    grid = (1, 4, 4)
    patches = jnp.asarray(
        rng.normal(size=(16, 3 * 2 * 14 * 14)).astype(np.float32)
    )
    layout = compute_vision_layout([grid], base_cfg)
    la = layout_device_args(layout, base_cfg)
    params = loop_tower.init(jax.random.PRNGKey(0), patches, **la)
    stacked = stack_qwen_layers(
        {"params": {"lm": {"model": {}}, "visual": params["params"]}},
        stack_vision=True,
    )
    sparams = {"params": stacked["params"]["visual"]}
    out_loop = loop_tower.apply(params, patches, **la)
    out_scan = scan_tower.apply(sparams, patches, **la)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=2e-4, atol=2e-4
    )
