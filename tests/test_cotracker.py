"""CoTrackerLite: shapes, differentiability, and overfit-on-one-clip sanity
(the tracker can learn a constant-velocity motion from supervision)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from rga3_tpu.models.stom.cotracker import (
    CoTrackerJax, CoTrackerLite, bilinear_sample,
)


def test_bilinear_sample_exact_on_grid():
    fmap = jnp.asarray(
        np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    )
    xy = jnp.asarray([[1.0, 2.0], [0.0, 0.0], [0.5, 0.5]])
    out = np.asarray(bilinear_sample(fmap, xy))
    assert out[0, 0] == 9.0  # row 2, col 1
    assert out[1, 0] == 0.0
    assert abs(out[2, 0] - (0 + 1 + 4 + 5) / 4) < 1e-5


@pytest.fixture(scope="module")
def tiny_tracker():
    model = CoTrackerLite(dim=64, heads=4, depth=1, num_scales=2,
                          iterations=2)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.random((3, 32, 32, 3)).astype(np.float32)
    )
    queries = jnp.asarray([[0.0, 8.0, 8.0], [0.0, 20.0, 12.0]])
    params = model.init(jax.random.PRNGKey(0), frames, queries)
    return model, params, frames, queries


def test_forward_shapes(tiny_tracker):
    model, params, frames, queries = tiny_tracker
    tracks, vis = model.apply(params, frames, queries)
    assert tracks.shape == (3, 2, 2)
    assert vis.shape == (3, 2)
    assert np.isfinite(np.asarray(tracks)).all()


def test_trainable_overfit_step(tiny_tracker):
    model, params, frames, queries = tiny_tracker
    target = jnp.asarray(
        np.stack([
            np.stack([[8.0 + 2 * t, 8.0], [20.0 + 2 * t, 12.0]])
            for t in range(3)
        ])
    )

    def loss_fn(p):
        tracks, _ = model.apply(p, frames, queries)
        return jnp.mean((tracks - target) ** 2)

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    l0 = float(loss_fn(params))
    p = params
    for _ in range(5):
        g = jax.grad(loss_fn)(p)
        upd, opt = tx.update(g, opt)
        p = optax.apply_updates(p, upd)
    l1 = float(loss_fn(p))
    assert np.isfinite(l1)
    assert l1 < l0  # learning signal flows through sampling + transformer


def test_stom_backend_interface(tiny_tracker):
    model, params, frames, queries = tiny_tracker
    backend = CoTrackerJax(model, params)
    mask = np.zeros((32, 32), np.uint8)
    mask[6:12, 6:12] = 1
    video = [
        (np.asarray(frames[i]) * 255).astype(np.uint8) for i in range(3)
    ]
    tracks, vis = backend.track(video, mask, 0, grid_size=8)
    assert tracks.shape[0] == 3 and tracks.shape[2] == 2
    assert vis.dtype == bool
