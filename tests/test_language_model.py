"""Tiny-config Qwen LM: forward shape, KV-cache decode == full forward."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.language import QwenForCausalLM, make_kv_cache


def _build():
    cfg = tiny_config(vocab_size=128).text
    model = QwenForCausalLM(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, size=(2, 10)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)
    return cfg, model, params, ids


def test_forward_shapes():
    cfg, model, params, ids = _build()
    out = model.apply(params, input_ids=ids)
    assert out["logits"].shape == (2, 10, 128)
    assert out["hidden_states"].shape == (2, 10, cfg.hidden_size)


@pytest.mark.slow
def test_cached_decode_matches_full_forward():
    cfg, model, params, ids = _build()
    full = model.apply(params, input_ids=ids)

    cache = make_kv_cache(cfg, batch=2, max_len=16, dtype=jnp.float32)
    # prefill with first 6 tokens
    out = model.apply(params, input_ids=ids[:, :6], cache=cache)
    cache = out["cache"]
    logits_steps = [out["logits"]]
    for t in range(6, 10):
        out = model.apply(params, input_ids=ids[:, t : t + 1], cache=cache)
        cache = out["cache"]
        logits_steps.append(out["logits"])
    stepped = jnp.concatenate(logits_steps, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(full["logits"]), rtol=2e-4, atol=2e-4
    )


def test_chunked_prefill_matches_full_forward():
    """A second multi-token chunk into a USED cache must attend to the
    cached prefix: the flash fast path is only legal on a fresh cache
    (the structural "fresh" marker), chunked prefill takes the masked
    path."""
    cfg, model, params, ids = _build()
    full = model.apply(params, input_ids=ids)

    cache = make_kv_cache(cfg, batch=2, max_len=16, dtype=jnp.float32)
    out1 = model.apply(params, input_ids=ids[:, :4], cache=cache)
    assert "fresh" not in out1["cache"]
    out2 = model.apply(params, input_ids=ids[:, 4:10], cache=out1["cache"])
    stepped = jnp.concatenate([out1["logits"], out2["logits"]], axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(full["logits"]), rtol=2e-4, atol=2e-4
    )


def test_segment_ids_isolate_padding():
    cfg, model, params, ids = _build()
    seg = jnp.asarray([[1] * 7 + [0] * 3, [1] * 10], jnp.int32)
    out = model.apply(params, input_ids=ids, segment_ids=seg)
    # sample 0's valid positions must equal an unpadded forward
    out_short = model.apply(params, input_ids=ids[:1, :7])
    np.testing.assert_allclose(
        np.asarray(out["logits"][0, :7]),
        np.asarray(out_short["logits"][0]),
        rtol=2e-4,
        atol=2e-4,
    )


def test_int8_kv_cache_decode_close_to_fp():
    """kv_cache_int8: same params, decode logits within quantization
    tolerance of the fp cache, through prefill + chunked prefill +
    single-token steps (the masked decode path dequantizes int8 K/V)."""
    cfg, model, params, ids = _build()
    qcfg = cfg.replace(kv_cache_int8=True)
    qmodel = QwenForCausalLM(qcfg)

    full = model.apply(params, input_ids=ids)["logits"]

    cache = make_kv_cache(qcfg, batch=2, max_len=16, dtype=jnp.float32)
    assert cache["k"].dtype == jnp.int8
    out = qmodel.apply(params, input_ids=ids[:, :4], cache=cache)
    logits_steps = [out["logits"]]
    # chunked prefill into a used int8 cache
    out = qmodel.apply(params, input_ids=ids[:, 4:7], cache=out["cache"])
    logits_steps.append(out["logits"])
    cache = out["cache"]
    for t in range(7, 10):
        out = qmodel.apply(
            params, input_ids=ids[:, t : t + 1], cache=cache
        )
        cache = out["cache"]
        logits_steps.append(out["logits"])
    stepped = np.asarray(jnp.concatenate(logits_steps, axis=1))
    ref = np.asarray(full)
    # absmax/127 per-vector quantization: ~0.5% relative K/V error;
    # bound the logit deviation relative to the logit scale
    scale = np.abs(ref).max()
    assert np.abs(stepped - ref).max() < 0.05 * max(scale, 1.0)
    # and the prefill chunk (fresh flash path, raw K/V) is exact
    np.testing.assert_allclose(
        stepped[:, :4], ref[:, :4], rtol=2e-4, atol=2e-4
    )


def test_int8_kv_cache_greedy_generate_runs():
    from rga3_tpu.models.qwen25vl import tiny_config as _tc
    from rga3_tpu.models.qwen25vl.model import Qwen25VL
    from rga3_tpu.models.qwen25vl.generate import greedy_generate
    from rga3_tpu.models.qwen25vl.positions import get_rope_index

    cfg = _tc(vocab_size=300)
    ids = np.random.default_rng(0).integers(0, 300, (2, 6)).astype(np.int32)
    model = Qwen25VL(cfg)
    params = model.init(jax.random.PRNGKey(0), input_ids=jnp.asarray(ids))
    pos, deltas = get_rope_index(cfg, ids)
    kw = dict(
        max_new_tokens=5, eos_token_id=10_000, pad_token_id=0,
        compute_dtype=jnp.float32,
    )
    ref = np.asarray(greedy_generate(
        model, params, jnp.asarray(ids), jnp.ones((2, 6), jnp.int32),
        jnp.asarray(pos), jnp.asarray(deltas), **kw,
    ))
    qmodel = Qwen25VL(cfg.replace(text=cfg.text.replace(kv_cache_int8=True)))
    got = np.asarray(greedy_generate(
        qmodel, params, jnp.asarray(ids), jnp.ones((2, 6), jnp.int32),
        jnp.asarray(pos), jnp.asarray(deltas), **kw,
    ))
    assert got.shape == ref.shape
    # greedy tokens agree on the tiny model (quant noise << logit gaps)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_sampling_generate_runs():
    """temperature>0 + top_p nucleus path through greedy_generate."""
    import jax
    from rga3_tpu.models.qwen25vl import tiny_config as _tc
    from rga3_tpu.models.qwen25vl.model import Qwen25VL
    from rga3_tpu.models.qwen25vl.generate import greedy_generate
    from rga3_tpu.models.qwen25vl.positions import get_rope_index

    cfg = _tc(vocab_size=300)
    model = Qwen25VL(cfg)
    ids = np.random.default_rng(0).integers(0, 300, (1, 6)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=jnp.asarray(ids))
    pos, deltas = get_rope_index(cfg, ids)
    outs = []
    for seed in (0, 1):
        toks = greedy_generate(
            model, params, jnp.asarray(ids),
            jnp.ones((1, 6), jnp.int32), jnp.asarray(pos),
            jnp.asarray(deltas), max_new_tokens=6,
            eos_token_id=10_000, pad_token_id=0,
            temperature=0.9, top_p=0.9,
            rng=jax.random.PRNGKey(seed),
            compute_dtype=jnp.float32,
        )
        outs.append(np.asarray(toks))
    assert outs[0].shape == (1, 6)
    # different seeds should (almost surely) sample different sequences
    assert not np.array_equal(outs[0], outs[1])


@pytest.mark.slow
def test_speculative_decode_token_exact():
    """Speculative draft-and-verify greedy == plain greedy for ANY draft
    (here: a differently-initialized tiny model), across k values."""
    import jax
    from rga3_tpu.models.qwen25vl import tiny_config as _tc
    from rga3_tpu.models.qwen25vl.model import Qwen25VL
    from rga3_tpu.models.qwen25vl.generate import (
        greedy_generate, speculative_greedy_generate,
    )
    from rga3_tpu.models.qwen25vl.positions import get_rope_index

    cfg = _tc(vocab_size=300)
    model = Qwen25VL(cfg)
    draft = Qwen25VL(cfg)
    ids = np.random.default_rng(1).integers(0, 300, (1, 6)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=jnp.asarray(ids))
    dparams = draft.init(jax.random.PRNGKey(9), input_ids=jnp.asarray(ids))
    pos, deltas = get_rope_index(cfg, ids)
    kw = dict(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 6), jnp.int32),
        position_ids=jnp.asarray(pos),
        rope_deltas=jnp.asarray(deltas),
        max_new_tokens=12,
        eos_token_id=10_000,
        pad_token_id=0,
        compute_dtype=jnp.float32,
    )
    ref = np.asarray(greedy_generate(model, params, **kw))
    for k in (1, 3):
        got, stats = speculative_greedy_generate(
            model, params, draft, dparams, k=k, **kw
        )
        np.testing.assert_array_equal(np.asarray(got), ref, err_msg=f"k={k}")
        assert stats["emitted"] == 12
        assert 1 <= stats["steps"] <= 12


@pytest.mark.slow
def test_speculative_decode_self_draft_accepts_everything():
    """With draft == target every proposal is accepted: k+1 tokens per
    verify step."""
    import jax
    from rga3_tpu.models.qwen25vl import tiny_config as _tc
    from rga3_tpu.models.qwen25vl.model import Qwen25VL
    from rga3_tpu.models.qwen25vl.generate import (
        greedy_generate, speculative_greedy_generate,
    )
    from rga3_tpu.models.qwen25vl.positions import get_rope_index

    cfg = _tc(vocab_size=300)
    model = Qwen25VL(cfg)
    ids = np.random.default_rng(2).integers(0, 300, (1, 5)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(3), input_ids=jnp.asarray(ids))
    pos, deltas = get_rope_index(cfg, ids)
    kw = dict(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 5), jnp.int32),
        position_ids=jnp.asarray(pos),
        rope_deltas=jnp.asarray(deltas),
        max_new_tokens=9,
        eos_token_id=10_000,
        pad_token_id=0,
        compute_dtype=jnp.float32,
    )
    ref = np.asarray(greedy_generate(model, params, **kw))
    got, stats = speculative_greedy_generate(
        model, params, model, params, k=3, **kw
    )
    np.testing.assert_array_equal(np.asarray(got), ref)
    # 1 prefill token + ceil(8 / 4) = 2 verify steps
    assert stats["steps"] == 2
