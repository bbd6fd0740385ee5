"""LoRA merge math + HF export/load roundtrip on the tiny Qwen."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.loader import load_qwen25vl_params
from rga3_tpu.models.qwen25vl.model import Qwen25VL
from rga3_tpu.train.export import export_hf_safetensors, merge_lora


@pytest.mark.slow
def test_lora_merge_equals_adapted_forward():
    cfg = tiny_config(vocab_size=500)
    lora_cfg = cfg.replace(
        text=cfg.text.replace(lora_rank=4, lora_alpha=8.0)
    )
    model_lora = Qwen25VL(lora_cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 500, (1, 6)), jnp.int32
    )
    params = model_lora.init(jax.random.PRNGKey(0), input_ids=ids)
    # give lora_b nonzero values so the adapter actually does something
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: (
            jnp.asarray(
                np.random.default_rng(1).normal(0, 0.1, x.shape), x.dtype
            )
            if "lora_b" in "/".join(str(k) for k in p) else x
        ),
        params,
    )
    out_lora = model_lora.apply(params, input_ids=ids)["logits"]

    merged = merge_lora(params, lora_alpha=8.0, lora_rank=4)
    model_plain = Qwen25VL(cfg)  # lora disabled
    out_merged = model_plain.apply(merged, input_ids=ids)["logits"]
    np.testing.assert_allclose(
        np.asarray(out_lora), np.asarray(out_merged), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_export_import_roundtrip(tmp_path):
    cfg = tiny_config(vocab_size=400)
    model = Qwen25VL(cfg)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, 400, (1, 5)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(1), input_ids=ids)
    wrapped = {"params": {"qwen": params["params"]}}
    n = export_hf_safetensors(wrapped, str(tmp_path))
    assert n > 10
    re_loaded = load_qwen25vl_params(str(tmp_path))
    out_a = model.apply(params, input_ids=ids)["logits"]
    out_b = model.apply(re_loaded, input_ids=ids)["logits"]
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-5
    )
