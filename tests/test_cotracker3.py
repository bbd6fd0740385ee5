"""CoTracker3-offline: forward shapes, official key layout, and the
torch-state-dict round-trip (VERDICT round-1 item 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rga3_tpu.models.stom.convert import (
    export_torch_state_dict, load_torch_state_dict,
)
from rga3_tpu.models.stom.cotracker3 import (
    CoTracker3Offline, CoTracker3Predictor, cotracker3_offline_config,
    get_2d_embedding, tiny_cotracker3_config,
)


@pytest.fixture(scope="module")
def tiny_shapes():
    """Params tree built from eval_shape (cheap — no compute); enough for
    every converter test."""
    cfg = tiny_cotracker3_config()
    model = CoTracker3Offline(cfg)
    frames = jax.ShapeDtypeStruct((4, 48, 64, 3), jnp.float32)
    queries = jax.ShapeDtypeStruct((6, 3), jnp.float32)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), frames, queries
    )
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: rng.normal(0, 0.02, s.shape).astype(np.float32), shapes
    )
    return cfg, model, params


@pytest.fixture(scope="module")
def tiny(tiny_shapes):
    cfg, model, params = tiny_shapes
    frames = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (4, 48, 64, 3)).astype(
            np.float32
        )
    )
    queries = jnp.asarray(
        [[0, 10, 12], [0, 30, 20], [2, 40, 24], [1, 5, 40], [3, 60, 30],
         [0, 20, 8]],
        jnp.float32,
    )
    return cfg, model, params, frames, queries


@pytest.mark.slow
def test_forward_shapes(tiny):
    cfg, model, params, frames, queries = tiny
    out = model.apply(params, frames, queries)
    t, n = frames.shape[0], queries.shape[0]
    assert out["tracks"].shape == (cfg.iters, t, n, 2)
    assert out["vis"].shape == (t, n)
    assert out["conf"].shape == (t, n)
    assert np.isfinite(np.asarray(out["tracks"])).all()
    # at the query frame the initial estimate is the query point itself;
    # refinement deltas must stay bounded at random init
    assert np.isfinite(np.asarray(out["vis"])).all()


def test_get_2d_embedding_dims():
    xy = jnp.ones((3, 5, 2))
    assert get_2d_embedding(xy, 8).shape == (3, 5, 18)
    assert get_2d_embedding(xy, 8, cat_coords=False).shape == (3, 5, 16)


def test_state_dict_roundtrip(tiny_shapes):
    _, _, params = tiny_shapes
    sd = export_torch_state_dict(params)
    # perturb every tensor, load, and re-export: must match the
    # perturbed values exactly (bijective mapping, correct transposes)
    sd2 = {k: v + 1.0 for k, v in sd.items()}
    loaded = load_torch_state_dict(params, sd2)
    back = export_torch_state_dict(loaded)
    assert set(back) == set(sd2)
    for k in sd2:
        np.testing.assert_array_equal(back[k], sd2[k])


def test_loader_rejects_missing_and_unexpected(tiny_shapes):
    _, _, params = tiny_shapes
    sd = export_torch_state_dict(params)
    bad = dict(sd)
    bad.pop("fnet.conv1.weight")
    bad["fnet.conv_nosuch.weight"] = np.zeros((1,))
    with pytest.raises(KeyError):
        load_torch_state_dict(params, bad)
    good = {f"model.{k}": v for k, v in sd.items()}  # wrapped prefix ok
    load_torch_state_dict(params, good)


def test_loader_rejects_shape_mismatch(tiny_shapes):
    _, _, params = tiny_shapes
    sd = export_torch_state_dict(params)
    sd["updateformer.input_transform.weight"] = np.zeros(
        (7, 7), np.float32
    )
    with pytest.raises(ValueError):
        load_torch_state_dict(params, sd)


@pytest.mark.slow
def test_official_key_layout():
    """The full-size model exposes exactly the published checkpoint
    layout: RAFT encoder stage/downsample keys, corr_mlp at 2401->384->256,
    updateformer blocks at hidden 384 with 64 virtual tracks."""
    cfg = cotracker3_offline_config()
    model = CoTracker3Offline(cfg)
    frames = jax.ShapeDtypeStruct((2, 384, 512, 3), jnp.float32)
    queries = jax.ShapeDtypeStruct((8, 3), jnp.float32)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), frames, queries
    )
    sd = export_torch_state_dict(
        jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    )
    expect = {
        "fnet.conv1.weight": (64, 3, 7, 7),
        "fnet.layer1.0.conv1.weight": (64, 64, 3, 3),
        "fnet.layer2.0.downsample.0.weight": (96, 64, 1, 1),
        "fnet.layer3.1.conv2.weight": (128, 128, 3, 3),
        "fnet.conv2.weight": (256, 416, 3, 3),
        "fnet.conv3.weight": (128, 256, 1, 1),
        "corr_mlp.fc1.weight": (384, 2401),
        "corr_mlp.fc2.weight": (256, 384),
        "updateformer.input_transform.weight": (384, cfg.input_dim),
        "updateformer.virual_tracks": (1, 64, 1, 384),
        "updateformer.time_blocks.2.attn.to_q.weight": (384, 384),
        "updateformer.time_blocks.0.attn.to_kv.weight": (768, 384),
        "updateformer.time_blocks.0.mlp.fc1.weight": (1536, 384),
        "updateformer.space_virtual_blocks.2.attn.to_out.weight":
            (384, 384),
        "updateformer.space_point2virtual_blocks.0.cross_attn.to_q.weight":
            (384, 384),
        "updateformer.space_virtual2point_blocks.1.norm_context.weight":
            (384,),
        "updateformer.flow_head.weight": (2, 384),
        "updateformer.vis_conf_head.weight": (2, 384),
    }
    for k, shape in expect.items():
        assert k in sd, f"missing official key {k}"
        assert sd[k].shape == shape, (k, sd[k].shape, shape)
    # layer1 blocks have no downsample (stride 1, equal channels)
    assert "fnet.layer1.0.downsample.0.weight" not in sd
    # DiT pre-norms are parameter-free
    assert not any(".norm1." in k or ".norm2." in k for k in sd)


def test_infer_config_recovers_tiny_dims(tiny_shapes):
    """Every weight-shaped config field is derivable from the exported
    state dict alone (VERDICT r2 item 6: mechanical shape inference)."""
    from rga3_tpu.models.stom.convert import infer_config_from_state_dict

    cfg, _, params = tiny_shapes
    sd = export_torch_state_dict(params)
    got = infer_config_from_state_dict(sd, base=cfg)
    assert got == cfg


@pytest.mark.slow
@pytest.mark.midlane
def test_infer_config_resolves_alternate_flow_width():
    """If the official build concatenates a DIFFERENT flow embedding
    (no raw-xy coords), the loader derives that from input_transform's
    width instead of erroring, and the strict load then succeeds."""
    import dataclasses

    from rga3_tpu.models.stom.convert import (
        build_cotracker3_from_state_dict, infer_config_from_state_dict,
    )

    base = tiny_cotracker3_config()
    official = dataclasses.replace(
        base, flow_cat_coords=False, flow_emb_dim=12
    )
    model = CoTracker3Offline(official)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((4, 48, 64, 3), jnp.float32),
        jax.ShapeDtypeStruct((6, 3), jnp.float32),
    )
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: rng.normal(0, 0.02, s.shape).astype(np.float32), shapes
    )
    sd = export_torch_state_dict(params)

    # base config (cat_coords=True, emb 8) disagrees with the checkpoint;
    # the inference must recover the official parse purely from shapes
    got = infer_config_from_state_dict(sd, base=base)
    assert got.flow_cat_coords is False
    assert got.flow_emb_dim == 12
    assert got.input_dim == official.input_dim

    model2, loaded = build_cotracker3_from_state_dict(sd, base=base)
    assert model2.cfg == official
    ref = export_torch_state_dict(loaded)
    for k in sd:
        np.testing.assert_array_equal(ref[k], sd[k])
    # and the rebuilt model runs at the inferred width
    out = model2.apply(
        loaded,
        jnp.asarray(rng.uniform(0, 255, (4, 48, 64, 3)), jnp.float32),
        jnp.asarray([[0, 10, 12], [1, 30, 20]], jnp.float32),
    )
    assert np.isfinite(np.asarray(out["tracks"])).all()


def test_infer_config_no_vis_conf_head(tiny_shapes):
    """Head presence is read from the checkpoint keys."""
    from rga3_tpu.models.stom.convert import infer_config_from_state_dict

    cfg, _, params = tiny_shapes
    sd = export_torch_state_dict(params)
    sd.pop("updateformer.vis_conf_head.weight")
    sd.pop("updateformer.vis_conf_head.bias")
    got = infer_config_from_state_dict(sd, base=cfg)
    assert got.linear_layer_for_vis_conf is False


@pytest.mark.slow
def test_predictor_tracks_translation(tiny):
    """A translating square: the predictor keeps a coherent point set and
    returns finite tracks through the STOM backend interface."""
    cfg, model, params, _, _ = tiny
    rng = np.random.default_rng(1)
    t, h, w = 4, 48, 64
    frames = []
    for i in range(t):
        f = rng.uniform(0, 60, (h, w, 3)).astype(np.float32)
        f[10 + 2 * i:22 + 2 * i, 8 + 3 * i:24 + 3 * i] = 230.0
        frames.append(f)
    mask = np.zeros((h, w), np.uint8)
    mask[12:20, 10:22] = 1
    pred = CoTracker3Predictor(params, model, max_points=16)
    tracks, vis = pred.track(frames, mask, 0, grid_size=8)
    assert tracks.shape[0] == t and tracks.shape[2] == 2
    assert vis.shape == tracks.shape[:2]
    assert np.isfinite(tracks).all()


@pytest.mark.slow
@pytest.mark.midlane
def test_bf16_compute_dtype_matches_f32(tiny):
    """compute_dtype='bfloat16' (the serving option; params stay f32)
    must track close to the f32 build on the same weights — coordinate
    state/norms/softmax stay f32, so drift is bounded by bf16 matmul
    rounding, not by iterate divergence."""
    import dataclasses

    cfg, model, params, frames, queries = tiny
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    model16 = CoTracker3Offline(cfg16)
    out32 = model.apply(params, frames, queries)
    out16 = model16.apply(params, frames, queries)
    assert out16["tracks"].dtype == out32["tracks"].dtype  # f32 coords
    d = np.abs(np.asarray(out16["tracks"][-1])
               - np.asarray(out32["tracks"][-1]))
    # tiny-config clips are 64x96: sub-pixel agreement expected
    assert d.max() < 1.0, d.max()
    dv = np.abs(np.asarray(out16["vis"]) - np.asarray(out32["vis"]))
    assert dv.max() < 0.5, dv.max()


def test_stencil_sample_matches_bilinear_interior():
    """stencil_sample == per-point bilinear_sample wherever the whole
    stencil lies inside the map (the patch trick shares the center's
    fractional offset — exact for interior points)."""
    from rga3_tpu.models.stom.cotracker import bilinear_sample
    from rga3_tpu.models.stom.cotracker3 import _stencil, stencil_sample

    rng = np.random.default_rng(0)
    h, w, c, r = 24, 32, 8, 3
    fmap = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    centers = jnp.asarray(
        rng.uniform(r + 1, min(h, w) - r - 2, size=(10, 2)).astype(
            np.float32
        )
    )
    stencil = jnp.asarray(_stencil(r))
    pts = centers[:, None, :] + stencil[None, :, :]
    ref = bilinear_sample(fmap, pts)
    got = stencil_sample(fmap, centers, r)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # border centers stay finite and in-range (replication semantics)
    edge = jnp.asarray([[0.3, 0.2], [w - 1.2, h - 1.1]], jnp.float32)
    out = np.asarray(stencil_sample(fmap, edge, r))
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_pre_resize_matches_device_resize(tiny):
    """Host PIL-BILINEAR pre-resize + query/track rescaling tracks the
    same points as shipping native-res frames and resizing on device
    (the two resize kernels agree within ~1/255, below the bf16 floor
    the model applies to the normalized video)."""
    cfg, model, params, _, _ = tiny
    rng = np.random.default_rng(2)
    t, h, w = 4, 48, 64  # != cfg.model_resolution (64, 96)
    frames = []
    for i in range(t):
        f = rng.uniform(0, 60, (h, w, 3))
        f[10 + 2 * i:22 + 2 * i, 8 + 3 * i:24 + 3 * i] = 230.0
        frames.append(f.astype(np.uint8))
    mask = np.zeros((h, w), np.uint8)
    mask[12:20, 10:22] = 1

    pred_host = CoTracker3Predictor(params, model, max_points=16)
    pred_dev = CoTracker3Predictor(params, model, max_points=16,
                                   pre_resize=False)
    tr_h, vis_h = pred_host.track(frames, mask, 0, grid_size=8)
    tr_d, vis_d = pred_dev.track(frames, mask, 0, grid_size=8)
    assert tr_h.shape == tr_d.shape
    # random-weight tiny model amplifies input deltas; sub-pixel-scale
    # agreement in input coords is what the swap must preserve
    assert np.abs(tr_h - tr_d).max() < 1.5, np.abs(tr_h - tr_d).max()
    assert (vis_h == vis_d).mean() > 0.9


@pytest.mark.slow
def test_track_batch_matches_single(tiny):
    """One vmapped dispatch over B clips == per-clip track calls
    (incl. mixed native resolutions unified by pre_resize, and an
    empty-mask sample)."""
    cfg, model, params, _, _ = tiny
    rng = np.random.default_rng(3)
    t = 4
    clips, masks = [], []
    for b, (h, w) in enumerate([(48, 64), (40, 56), (48, 64)]):
        frames = []
        for i in range(t):
            f = rng.uniform(0, 60, (h, w, 3))
            f[8 + 2 * i:20 + 2 * i, 6 + 3 * i:20 + 3 * i] = 220.0
            frames.append(f.astype(np.uint8))
        clips.append(frames)
        m = np.zeros((h, w), np.uint8)
        if b != 2:  # third sample: empty mask
            m[10:18, 8:18] = 1
        masks.append(m)
    idxs = [0, 1, 0]
    # max_batch_clips=2 forces the chunked dispatch (2 + 1, incl. the
    # single-clip remainder path)
    pred = CoTracker3Predictor(
        params, model, max_points=8, max_batch_clips=2
    )
    got = pred.track_batch(clips, masks, idxs, grid_size=6)
    for i in range(3):
        tr_s, vis_s = pred.track(clips[i], masks[i], idxs[i], grid_size=6)
        tr_b, vis_b = got[i]
        assert tr_b.shape == tr_s.shape
        np.testing.assert_allclose(tr_b, tr_s, atol=5e-2)
        if vis_s.size:
            assert (vis_b == vis_s).mean() > 0.95
    assert got[2][0].shape == (t, 0, 2)


def test_save_load_self_describing_roundtrip(tiny_shapes, tmp_path):
    """save_cotracker3 embeds the config; load_cotracker3 reconstructs
    (params within f16 storage rounding, config exactly)."""
    from rga3_tpu.models.stom.cotracker3 import (
        load_cotracker3, save_cotracker3,
    )

    cfg, _model, params = tiny_shapes
    path = str(tmp_path / "ct3.npz")
    save_cotracker3(path, params, cfg)
    params2, cfg2 = load_cotracker3(path)
    assert cfg2 == cfg
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_default_tracker_resolution(tiny_shapes, tmp_path, monkeypatch):
    """STOM's default backend: lk forces LK; auto prefers shipped
    CoTracker3 weights when the file exists and falls back to LK when it
    doesn't; cotracker3 without weights is a loud error."""
    from rga3_tpu.models.stom import cotracker3 as ct3_mod
    from rga3_tpu.models.stom.cotracker3 import (
        CoTracker3Predictor, save_cotracker3,
    )
    from rga3_tpu.models.stom.stom import default_tracker
    from rga3_tpu.models.stom.tracker import LKTracker

    cfg, _model, params = tiny_shapes

    monkeypatch.setenv("RGA3_STOM_TRACKER", "lk")
    assert isinstance(default_tracker(), LKTracker)

    missing = str(tmp_path / "missing.npz")
    monkeypatch.setattr(ct3_mod, "_SHIPPED_WEIGHTS", missing)
    monkeypatch.setenv("RGA3_STOM_TRACKER", "auto")
    assert isinstance(default_tracker(), LKTracker)
    monkeypatch.setenv("RGA3_STOM_TRACKER", "cotracker3")
    with pytest.raises(FileNotFoundError):
        default_tracker()

    shipped = str(tmp_path / "shipped.npz")
    save_cotracker3(shipped, params, cfg)
    monkeypatch.setattr(ct3_mod, "_SHIPPED_WEIGHTS", shipped)
    monkeypatch.setenv("RGA3_STOM_TRACKER", "auto")
    tracker = default_tracker()
    assert isinstance(tracker, CoTracker3Predictor)
    assert tracker.model.cfg == cfg


def test_default_tracker_path_override(tiny_shapes, tmp_path, monkeypatch):
    """RGA3_STOM_TRACKER may be a path to any self-describing weights
    npz (e.g. the official-dims training output) — loaded directly,
    loud error when the file is missing."""
    from rga3_tpu.models.stom.cotracker3 import (
        CoTracker3Predictor, save_cotracker3,
    )
    from rga3_tpu.models.stom.stom import default_tracker

    cfg, _model, params = tiny_shapes
    p = str(tmp_path / "official.npz")
    save_cotracker3(p, params, cfg)
    monkeypatch.setenv("RGA3_STOM_TRACKER", p)
    tracker = default_tracker()
    assert isinstance(tracker, CoTracker3Predictor)
    assert tracker.model.cfg == cfg

    monkeypatch.setenv("RGA3_STOM_TRACKER", str(tmp_path / "nope.npz"))
    with pytest.raises(FileNotFoundError):
        default_tracker()
