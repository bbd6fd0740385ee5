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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_synthetic_batch_geometry():
    """gt tracks at frame 0 equal the query positions; motion is smooth."""
    from rga3_tpu.models.stom.synth import make_synthetic_batch

    rng = np.random.default_rng(0)
    frames, queries, gt = make_synthetic_batch(rng, t=5, h=48, w=48,
                                               n_points=6)
    assert frames.shape == (5, 48, 48, 3)
    assert frames.min() >= 0 and frames.max() <= 1
    np.testing.assert_allclose(gt[0], queries[:, 1:3], atol=1e-3)
    steps = np.linalg.norm(np.diff(gt, axis=0), axis=-1)
    assert steps.max() < 6.0  # bounded per-frame motion


@pytest.mark.slow
def test_cotracker_learns_on_synthetic_motion():
    """A few optimizer steps reduce tracking error on held-out motion —
    the trainable stand-in for the unavailable CoTracker3 checkpoint."""
    import jax
    import jax.numpy as jnp
    import optax

    from rga3_tpu.models.stom.cotracker import CoTrackerLite
    from rga3_tpu.models.stom.synth import make_synthetic_batch
    from scripts.train_cotracker import build_train_step

    model = CoTrackerLite(dim=32, heads=2, depth=1, num_scales=2,
                          iterations=2)
    rng = np.random.default_rng(1)
    frames, queries, gt = make_synthetic_batch(rng, t=4, h=32, w=32,
                                               n_points=4)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames), jnp.asarray(queries)
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = build_train_step(model, tx)

    def eval_err(p):
        hf, hq, hgt = make_synthetic_batch(
            np.random.default_rng(999), t=4, h=32, w=32, n_points=4
        )
        tr, _ = model.apply(p, jnp.asarray(hf), jnp.asarray(hq))
        return float(jnp.abs(tr - jnp.asarray(hgt)).mean())

    losses = []
    for i in range(12):
        frames, queries, gt = make_synthetic_batch(rng, t=4, h=32, w=32,
                                                   n_points=4)
        params, opt_state, loss, _ = step(
            params, opt_state, jnp.asarray(frames), jnp.asarray(queries),
            jnp.asarray(gt),
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from rga3_tpu.models.stom.cotracker import (
        CoTrackerLite, load_params, save_params,
    )
    from rga3_tpu.models.stom.synth import make_synthetic_batch

    model = CoTrackerLite(dim=32, heads=2, depth=1, num_scales=2,
                          iterations=1)
    frames, queries, _ = make_synthetic_batch(
        np.random.default_rng(0), t=3, h=32, w=32, n_points=3
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames), jnp.asarray(queries)
    )
    path = str(tmp_path / "ck.npz")
    save_params(path, params)
    like = model.init(
        jax.random.PRNGKey(1), jnp.asarray(frames), jnp.asarray(queries)
    )
    restored = load_params(path, like)
    a = jax.flatten_util.ravel_pytree(params)[0]
    b = jax.flatten_util.ravel_pytree(restored)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
