"""Numeric parity vs HF transformers Qwen2.5-VL (tiny config, fp32).

Builds a small HF Qwen2_5_VLForConditionalGeneration with random weights,
saves it, loads through rga3_tpu's HF loader, and compares logits for a
text-only prompt and a vision prompt. This is the checkpoint-compatibility
guarantee (BASELINE.md: "UniGR-7B HF checkpoints load unchanged").
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rga3_tpu.models.qwen25vl.config import (
    Qwen25VLConfig, QwenTextConfig, QwenVisionConfig,
)
from rga3_tpu.models.qwen25vl.loader import map_hf_key, _set
from rga3_tpu.models.qwen25vl.model import Qwen25VL
from rga3_tpu.models.qwen25vl.positions import get_rope_index
from rga3_tpu.models.qwen25vl.vision import (
    compute_vision_layout, layout_device_args,
)

VOCAB = 151936 + 80  # covers special tokens within tiny embedding


@pytest.fixture(scope="module")
def hf_and_ours(tmp_path_factory):
    hf_cfg = transformers.Qwen2_5_VLConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(
            depth=2,
            hidden_size=32,
            intermediate_size=64,
            num_heads=4,
            patch_size=14,
            spatial_merge_size=2,
            temporal_patch_size=2,
            window_size=28,
            fullatt_block_indexes=[1],
            out_hidden_size=64,
            tokens_per_second=2,
        ),
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()

    ours_cfg = Qwen25VLConfig(
        vision=QwenVisionConfig(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
            window_size=28, fullatt_block_indexes=(1,), out_hidden_size=64,
        ),
        text=QwenTextConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, mrope_section=(2, 3, 3),
            tie_word_embeddings=False,
        ),
    )
    model = Qwen25VL(ours_cfg)

    tree = {}
    for key, val in hf.state_dict().items():
        mapped = map_hf_key(key)
        if mapped is None:
            continue
        path, t = mapped
        v = val.detach().float().numpy()
        if t == "conv3d":
            v = v.reshape(v.shape[0], -1).T
        elif t:
            v = v.T
        _set(tree, path, v)
    params = {"params": tree}
    return hf, hf_cfg, model, ours_cfg, params


def test_text_only_logits_match(hf_and_ours):
    hf, hf_cfg, model, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, size=(2, 9)).astype(np.int64)
    with torch.no_grad():
        out_hf = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones(2, 9, dtype=torch.long),
        ).logits.numpy()
    pos, _ = get_rope_index(ours_cfg, ids)
    out = model.apply(
        params,
        input_ids=jnp.asarray(ids, jnp.int32),
        position_ids=jnp.asarray(pos),
    )["logits"]
    np.testing.assert_allclose(
        np.asarray(out), out_hf, rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
@pytest.mark.midlane
def test_vision_logits_match(hf_and_ours):
    hf, hf_cfg, model, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(1)
    grid = (1, 4, 6)  # 24 patches -> 6 merged tokens
    n_vis = 24 // 4
    patches = rng.normal(size=(24, 3 * 2 * 14 * 14)).astype(np.float32)

    # well-formed vision span: <|vision_start|> pads <|vision_end|>
    ids = rng.integers(0, 1000, size=(1, 8 + n_vis)).astype(np.int64)
    ids[0, 0] = 11
    ids[0, 2] = hf_cfg.vision_start_token_id
    ids[0, 3 : 3 + n_vis] = hf_cfg.image_token_id
    ids[0, 3 + n_vis] = hf_cfg.vision_end_token_id
    with torch.no_grad():
        out_hf = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones_like(torch.tensor(ids)),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
        ).logits.numpy()

    layout = compute_vision_layout([grid], ours_cfg.vision)
    la = layout_device_args(layout, ours_cfg.vision)
    pos, _ = get_rope_index(ours_cfg, ids, image_grid_thw=[grid])
    out = model.apply(
        params,
        input_ids=jnp.asarray(ids, jnp.int32),
        position_ids=jnp.asarray(pos),
        pixel_patches=jnp.asarray(patches),
        vision_layout=la,
    )["logits"]
    np.testing.assert_allclose(
        np.asarray(out), out_hf, rtol=3e-3, atol=3e-3
    )


def test_video_rope_index_matches_hf(hf_and_ours):
    hf, hf_cfg, model, ours_cfg, params = hf_and_ours
    from rga3_tpu.models.qwen25vl.positions import get_rope_index

    rng = np.random.default_rng(3)
    grid = (2, 4, 4)  # video: 2 temporal groups
    n_vis = 2 * 16 // 4
    ids = rng.integers(0, 1000, size=(1, 10 + n_vis)).astype(np.int64)
    ids[0, 2] = hf_cfg.vision_start_token_id
    ids[0, 3 : 3 + n_vis] = hf_cfg.video_token_id
    ids[0, 3 + n_vis] = hf_cfg.vision_end_token_id
    spg = [1.5]
    pos_hf, delta_hf = hf.model.get_rope_index(
        torch.tensor(ids),
        video_grid_thw=torch.tensor([list(grid)]),
        second_per_grid_ts=torch.tensor(spg),
        attention_mask=torch.ones_like(torch.tensor(ids)),
    )
    pos, delta = get_rope_index(
        ours_cfg, ids, video_grid_thw=[grid], second_per_grid_ts=spg
    )
    np.testing.assert_array_equal(pos_hf.numpy(), pos)
    np.testing.assert_array_equal(
        delta_hf.numpy().reshape(-1), delta
    )


def test_greedy_generate_matches_hf(hf_and_ours):
    """Token-exact greedy decode vs HF .generate — locks the decode-step
    M-RoPE positions (first generated token sits at last_prompt_pos + 1;
    a +1 shift here reproduces a real off-by-one regression)."""
    from rga3_tpu.models.qwen25vl.generate import greedy_generate

    hf, hf_cfg, model, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(7)
    n_new = 6
    ids = rng.integers(0, 1000, size=(1, 9)).astype(np.int64)
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones(1, 9, dtype=torch.long),
            max_new_tokens=n_new,
            do_sample=False,
            eos_token_id=VOCAB - 1,
            pad_token_id=0,
        ).numpy()[:, ids.shape[1]:]
    pos, deltas = get_rope_index(ours_cfg, ids)
    toks = greedy_generate(
        model, params, jnp.asarray(ids, jnp.int32),
        jnp.ones((1, 9), jnp.int32), jnp.asarray(pos),
        jnp.asarray(deltas), max_new_tokens=n_new,
        eos_token_id=VOCAB - 1, pad_token_id=0,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(toks), hf_out)


def test_decode_step_logits_match_hf_positions(hf_and_ours):
    """Decode-step logits parity at an explicitly known position: prefill
    L-1 tokens into the cache, feed token L-1 at M-RoPE position
    next_pos + 0, and require the logits to match HF's full-sequence
    forward at row L-1. A +1 position shift (the regression the
    token-exact test above can miss on a position-insensitive tiny
    model) fails this at fp32 tolerance."""
    hf, hf_cfg, model, ours_cfg, params = hf_and_ours
    from rga3_tpu.models.qwen25vl.language import make_kv_cache

    rng = np.random.default_rng(9)
    L = 10
    ids = rng.integers(0, 1000, size=(1, L)).astype(np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones(1, L, dtype=torch.long),
        ).logits.numpy()[:, -1]

    pos, deltas = get_rope_index(ours_cfg, ids[:, : L - 1])
    cache = make_kv_cache(ours_cfg.text, 1, L + 4, dtype=jnp.float32)
    out = model.apply(
        params,
        input_ids=jnp.asarray(ids[:, : L - 1], jnp.int32),
        position_ids=jnp.asarray(pos),
        segment_ids=jnp.ones((1, L - 1), jnp.int32),
        cache=cache,
        compute_dtype=jnp.float32,
    )
    # the decode-step position for sequence index L-1 (0-based) is
    # prompt_len + rope_delta + 0 — the same arithmetic generate.py uses
    next_pos = (L - 1) + int(np.asarray(deltas)[0])
    step_pos = jnp.full((3, 1, 1), next_pos, jnp.int32)
    out2 = model.apply(
        params,
        input_ids=jnp.asarray(ids[:, L - 1 :], jnp.int32),
        position_ids=step_pos,
        cache=out["cache"],
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out2["logits"][:, -1]), ref, rtol=2e-3, atol=2e-3
    )
    # and a +1-shifted position must NOT pass the same tolerance
    # (position sensitivity — guards against this test passing vacuously
    # on a position-insensitive model)
    out3 = model.apply(
        params,
        input_ids=jnp.asarray(ids[:, L - 1 :], jnp.int32),
        position_ids=step_pos + 1,
        cache=out["cache"],
        compute_dtype=jnp.float32,
    )
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(
            np.asarray(out3["logits"][:, -1]), ref, rtol=2e-3, atol=2e-3
        )


def test_greedy_generate_vision_matches_hf(hf_and_ours):
    """Greedy decode parity with a vision span — nonzero rope_delta, so
    decode positions exercise the next_pos = len + delta arithmetic."""
    from rga3_tpu.models.qwen25vl.generate import greedy_generate

    hf, hf_cfg, model, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(8)
    n_new = 5
    grid = (1, 4, 6)
    n_vis = 24 // 4
    patches = rng.normal(size=(24, 3 * 2 * 14 * 14)).astype(np.float32)
    ids = rng.integers(0, 1000, size=(1, 8 + n_vis)).astype(np.int64)
    ids[0, 2] = hf_cfg.vision_start_token_id
    ids[0, 3 : 3 + n_vis] = hf_cfg.image_token_id
    ids[0, 3 + n_vis] = hf_cfg.vision_end_token_id
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones_like(torch.tensor(ids)),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=n_new,
            do_sample=False,
            eos_token_id=VOCAB - 1,
            pad_token_id=0,
        ).numpy()[:, ids.shape[1]:]
    layout = compute_vision_layout([grid], ours_cfg.vision)
    la = layout_device_args(layout, ours_cfg.vision)
    pos, deltas = get_rope_index(ours_cfg, ids, image_grid_thw=[grid])
    toks = greedy_generate(
        model, params, jnp.asarray(ids, jnp.int32),
        jnp.ones_like(jnp.asarray(ids, jnp.int32)), jnp.asarray(pos),
        jnp.asarray(deltas), max_new_tokens=n_new,
        eos_token_id=VOCAB - 1, pad_token_id=0,
        pixel_patches=jnp.asarray(patches),
        vision_layout=la,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(toks), hf_out)
