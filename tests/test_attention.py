"""Flash attention (interpret-mode Pallas) vs XLA reference."""
import numpy as np
import pytest
import jax.numpy as jnp

from rga3_tpu.ops.attention import flash_attention, mha_reference


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def test_reference_causal_gqa():
    q = _rand((2, 16, 8, 16), 0)
    k = _rand((2, 16, 2, 16), 1)
    v = _rand((2, 16, 2, 16), 2)
    out = mha_reference(q, k, v, causal=True)
    assert out.shape == q.shape
    # first token only attends to itself
    expect0 = np.asarray(v[:, 0])
    got0 = np.asarray(out[:, 0, 0::4])  # heads sharing kv head 0..1
    np.testing.assert_allclose(got0[:, 0], expect0[:, 0], rtol=1e-5)


def test_reference_segment_ids_block_cross_attention():
    q = _rand((1, 8, 2, 16), 3)
    k, v = _rand((1, 8, 2, 16), 4), _rand((1, 8, 2, 16), 5)
    seg = jnp.asarray([[0, 0, 0, 0, 1, 1, 1, 1]])
    out = mha_reference(q, k, v, segment_ids=seg)
    # segment 1 output must equal attention computed on segment alone
    out_b = mha_reference(q[:, 4:], k[:, 4:], v[:, 4:])
    np.testing.assert_allclose(
        np.asarray(out[:, 4:]), np.asarray(out_b), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("lq,lk", [(128, 128), (256, 256)])
def test_flash_interpret_matches_reference(causal, lq, lk):
    q = _rand((1, lq, 2, 64), 6)
    k = _rand((1, lk, 2, 64), 7)
    v = _rand((1, lk, 2, 64), 8)
    ref = mha_reference(q, k, v, causal=causal)
    got = flash_attention(
        q, k, v, causal=causal, interpret=True, block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_flash_interpret_segments_and_padding():
    lq = 200  # forces padding to 256
    q = _rand((1, lq, 2, 32), 9)
    k, v = _rand((1, lq, 2, 32), 10), _rand((1, lq, 2, 32), 11)
    seg = jnp.asarray(
        (np.arange(lq) // 50)[None, :], jnp.int32
    )  # 4 segments of 50
    ref = mha_reference(q, k, v, segment_ids=seg)
    got = flash_attention(
        q, k, v, segment_ids=seg, interpret=True, block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_window_attention_matches_reference_segments():
    from rga3_tpu.ops.attention import window_attention

    rng = np.random.default_rng(12)
    B, L, H, D, W = 2, 256, 2, 32, 16
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    seg = jnp.asarray((np.arange(L) // W)[None].repeat(B, 0), jnp.int32)
    ref = mha_reference(q, k, v, segment_ids=seg)
    got_cpu = window_attention(q, k, v, W)  # CPU fallback path
    np.testing.assert_allclose(
        np.asarray(got_cpu), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    got_kernel = window_attention(
        q, k, v, W, interpret=True, block_q=128
    )
    np.testing.assert_allclose(
        np.asarray(got_kernel), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_flash_interpret_block_skipping_windows():
    """Segment-range kv-block skipping: window-ordered contiguous
    segments spanning many blocks (the Qwen ViT layout) must match the
    reference exactly — skipped blocks are provably fully-masked."""
    lq = 512  # 4 blocks of 128; 16-token windows -> 32 segments
    q = _rand((1, lq, 2, 32), 20)
    k, v = _rand((1, lq, 2, 32), 21), _rand((1, lq, 2, 32), 22)
    seg = jnp.asarray((np.arange(lq) // 16)[None, :], jnp.int32)
    ref = mha_reference(q, k, v, segment_ids=seg)
    got = flash_attention(
        q, k, v, segment_ids=seg, interpret=True, block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_flash_interpret_block_skipping_non_contiguous():
    """Scrambled (non-contiguous) segment ids: ranges overlap almost
    everywhere, so skipping degrades to no-skip — results must still
    match the reference (the check is conservative, never wrong)."""
    lq = 256
    rng = np.random.default_rng(23)
    q = _rand((1, lq, 2, 32), 24)
    k, v = _rand((1, lq, 2, 32), 25), _rand((1, lq, 2, 32), 26)
    seg = jnp.asarray(
        rng.integers(0, 8, size=(1, lq)).astype(np.int32)
    )
    ref = mha_reference(q, k, v, segment_ids=seg)
    got = flash_attention(
        q, k, v, segment_ids=seg, interpret=True, block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_flash_interpret_causal_with_segments_skipping():
    """Causal + packed segments: diagonal skipping composes with the
    segment-range check."""
    lq = 256
    q = _rand((1, lq, 2, 32), 27)
    k, v = _rand((1, lq, 2, 32), 28), _rand((1, lq, 2, 32), 29)
    seg = jnp.asarray((np.arange(lq) // 64)[None, :], jnp.int32)
    ref = mha_reference(q, k, v, causal=True, segment_ids=seg)
    got = flash_attention(
        q, k, v, causal=True, segment_ids=seg, interpret=True,
        block_q=128, block_k=128,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
