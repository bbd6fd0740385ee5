"""scan_layers decoder == per-layer loop decoder (same weights)."""
import numpy as np
import jax
import jax.numpy as jnp

from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.language import QwenForCausalLM, make_kv_cache
from rga3_tpu.models.qwen25vl.loader import stack_qwen_layers


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
