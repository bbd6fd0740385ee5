import numpy as np
import jax
import jax.numpy as jnp

from rga3_tpu.ops import seg_gather

SEG = 999


def test_shift_and_gather_first_seg():
    B, L, D = 3, 8, 4
    ids = np.zeros((B, L), np.int32)
    ids[0, 3] = SEG  # hidden state at position 2 predicts it
    ids[2, 1] = SEG
    hidden = np.arange(B * L * D, dtype=np.float32).reshape(B, L, D)
    emb, has = seg_gather.gather_seg_embeddings(
        jnp.asarray(hidden), jnp.asarray(ids), SEG
    )
    np.testing.assert_array_equal(np.asarray(has), [True, False, True])
    np.testing.assert_allclose(np.asarray(emb[0]), hidden[0, 2])
    np.testing.assert_allclose(np.asarray(emb[1]), np.zeros(D))
    np.testing.assert_allclose(np.asarray(emb[2]), hidden[2, 0])


def test_gather_is_jittable():
    f = jax.jit(
        lambda h, i: seg_gather.gather_seg_embeddings(h, i, SEG)
    )
    h = jnp.ones((2, 6, 4))
    i = jnp.zeros((2, 6), jnp.int32).at[0, 2].set(SEG)
    emb, has = f(h, i)
    assert emb.shape == (2, 4)
    assert bool(has[0]) and not bool(has[1])


def test_tile_seg_embeddings():
    emb = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 4))
    tiled = seg_gather.tile_seg_embeddings(emb, 3)
    assert tiled.shape == (6, 1, 4)
    np.testing.assert_allclose(np.asarray(tiled[0, 0]), np.asarray(emb[0]))
    np.testing.assert_allclose(np.asarray(tiled[2, 0]), np.asarray(emb[0]))
    np.testing.assert_allclose(np.asarray(tiled[3, 0]), np.asarray(emb[1]))
