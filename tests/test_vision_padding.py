"""Static-budget vision padding: padded forward == unpadded forward."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.qwen25vl.model import Qwen25VL
from rga3_tpu.models.qwen25vl.positions import get_rope_index
from rga3_tpu.models.qwen25vl.vision import (
    compute_vision_layout, layout_device_args, pad_vision_inputs,
)


@pytest.mark.slow
def test_padded_vision_matches_unpadded():
    cfg = tiny_config(vocab_size=160_000)
    model = Qwen25VL(cfg)
    rng = np.random.default_rng(0)
    grid = (1, 4, 4)  # 16 patches -> 4 merged tokens
    n_vis = 4
    patches = rng.normal(size=(16, 3 * 2 * 14 * 14)).astype(np.float32)
    layout = compute_vision_layout([grid], cfg.vision)

    ids = rng.integers(0, 1000, size=(1, 8 + n_vis)).astype(np.int32)
    ids[0, 2] = cfg.vision_start_token_id
    ids[0, 3 : 3 + n_vis] = cfg.image_token_id
    pos, _ = get_rope_index(cfg, ids, image_grid_thw=[grid])

    la = layout_device_args(layout, cfg.vision)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.asarray(ids),
        pixel_patches=jnp.asarray(patches), vision_layout=la,
    )
    base = model.apply(
        params, input_ids=jnp.asarray(ids),
        position_ids=jnp.asarray(pos),
        pixel_patches=jnp.asarray(patches), vision_layout=la,
    )["logits"]

    for budget in (16, 32, 64):
        padded, la_p = pad_vision_inputs(
            patches, layout, cfg.vision, budget
        )
        assert padded.shape[0] == budget
        out = model.apply(
            params, input_ids=jnp.asarray(ids),
            position_ids=jnp.asarray(pos),
            pixel_patches=jnp.asarray(padded),
            vision_layout={k: jnp.asarray(v) for k, v in la_p.items()},
        )["logits"]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), rtol=2e-4, atol=2e-4,
            err_msg=f"budget={budget}",
        )


@pytest.mark.slow
def test_padding_multiple_grids():
    cfg = tiny_config(vocab_size=160_000)
    model = Qwen25VL(cfg)
    rng = np.random.default_rng(1)
    grids = [(1, 2, 4), (1, 4, 2)]  # 8 + 8 patches
    patches = rng.normal(size=(16, 3 * 2 * 14 * 14)).astype(np.float32)
    layout = compute_vision_layout(grids, cfg.vision)
    n_vis = 4
    ids = rng.integers(0, 1000, size=(1, 10 + n_vis)).astype(np.int32)
    ids[0, 1 : 1 + 2] = cfg.image_token_id
    ids[0, 6 : 6 + 2] = cfg.image_token_id
    pos, _ = get_rope_index(cfg, ids, image_grid_thw=grids)
    la = layout_device_args(layout, cfg.vision)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.asarray(ids),
        pixel_patches=jnp.asarray(patches), vision_layout=la,
    )
    base = model.apply(
        params, input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
        pixel_patches=jnp.asarray(patches), vision_layout=la,
    )["logits"]
    padded, la_p = pad_vision_inputs(patches, layout, cfg.vision, 48)
    out = model.apply(
        params, input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
        pixel_patches=jnp.asarray(padded),
        vision_layout={k: jnp.asarray(v) for k, v in la_p.items()},
    )["logits"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base), rtol=2e-4, atol=2e-4
    )


def test_uniform_window_path_matches_legacy_on_ragged_grid():
    """The uniform-window attention path (win_pad/win_unpad gathers +
    batched per-window attention) must equal the legacy ragged-window
    segment-id path on a grid whose edge windows are partial. The tiny
    config's window covers one merge unit (never ragged), so this test
    widens the window to 2x2 units and uses a non-divisible grid."""
    from rga3_tpu.models.qwen25vl.vision import QwenVisionTower

    cfg = tiny_config(vocab_size=300).vision.replace(
        window_size=56, fullatt_block_indexes=(1,)
    )  # wsize = 56/2/14 = 2 merged units per window side
    grid = (1, 6, 10)  # lh=3, lw=5 -> padded to 4x6: ragged edge windows
    n_patches = 60
    rng = np.random.default_rng(3)
    patches = jnp.asarray(
        rng.normal(size=(n_patches, 3 * 2 * 14 * 14)).astype(np.float32)
    )
    layout = compute_vision_layout([grid], cfg)
    assert (layout.win_pad_units < 0).any(), "grid not ragged"
    la = layout_device_args(layout, cfg)
    la_legacy = {
        k: v for k, v in la.items() if k not in ("win_pad", "win_unpad")
    }
    tower = QwenVisionTower(cfg)
    params = tower.init(jax.random.PRNGKey(0), patches, **la)
    out_new = tower.apply(params, patches, **la)
    out_legacy = tower.apply(params, patches, **la_legacy)
    np.testing.assert_allclose(
        np.asarray(out_new), np.asarray(out_legacy), rtol=2e-4, atol=2e-4
    )
    # scanned blocks take the lax.cond branch — same equality
    tower_s = QwenVisionTower(cfg.replace(scan_blocks=True))
    from rga3_tpu.models.qwen25vl.loader import stack_qwen_layers

    stacked = stack_qwen_layers(
        {"params": {"lm": {"model": {}}, "visual": params["params"]}},
        stack_vision=True,
    )
    out_scan = tower_s.apply(
        {"params": stacked["params"]["visual"]}, patches, **la
    )
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_legacy), rtol=2e-4, atol=2e-4
    )


def test_uniform_window_train_grads_match_legacy_mixed_batch():
    """VERDICT r3 item 7: the uniform-window attention path must be
    differentiable-identical to the legacy ragged path in a jitted TRAIN
    step over a mixed image+video batch at a static patch budget (edge
    windows partial, budget-pad tokens present). Asserts loss and every
    vision-parameter gradient match."""
    from rga3_tpu.models.qwen25vl.vision import QwenVisionTower

    cfg = tiny_config(vocab_size=300).vision.replace(
        window_size=56, fullatt_block_indexes=(1,)
    )  # 2x2 merged units per window
    # image grid with ragged edge windows + a 2-frame video grid
    grids = [(1, 6, 10), (2, 4, 6)]  # 60 + 48 = 108 patches
    rng = np.random.default_rng(5)
    patches = rng.normal(size=(108, 3 * 2 * 14 * 14)).astype(np.float32)
    layout = compute_vision_layout(grids, cfg)
    assert (layout.win_pad_units < 0).any(), "grid not ragged"
    budget = 128  # static budget > real patches: pad tokens in play
    padded, la_p = pad_vision_inputs(patches, layout, cfg, budget)
    la_p = {k: jnp.asarray(v) for k, v in la_p.items()}
    la_legacy = {
        k: v for k, v in la_p.items() if k not in ("win_pad", "win_unpad")
    }

    tower = QwenVisionTower(cfg)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(padded), **la_p)
    # fixed per-token weights stand in for the LM loss gradient arriving
    # at the vision output
    n_out = int(tower.apply(params, jnp.asarray(padded), **la_p).shape[0])
    w_out = jnp.asarray(
        rng.normal(size=(n_out, cfg.out_hidden_size)).astype(np.float32)
    )

    def make_loss(la):
        def loss(p, x):
            out = tower.apply(p, x, **la)
            return jnp.sum(out * w_out)
        return jax.jit(jax.value_and_grad(loss))

    l_new, g_new = make_loss(la_p)(params, jnp.asarray(padded))
    l_old, g_old = make_loss(la_legacy)(params, jnp.asarray(padded))
    np.testing.assert_allclose(
        float(l_new), float(l_old), rtol=2e-4, atol=2e-4
    )
    flat_new = jax.tree_util.tree_leaves_with_path(g_new)
    flat_old = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_old)
    }
    assert flat_new
    for k, v in flat_new:
        ref = flat_old[jax.tree_util.keystr(k)]
        scale = max(float(jnp.max(jnp.abs(ref))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), rtol=5e-4,
            atol=5e-4 * scale,
            err_msg=jax.tree_util.keystr(k),
        )


def test_window_resident_matches_legacy_forward_and_grads():
    """window_resident=True (tokens stay in padded window order across
    the whole stack; zero per-block gathers) must match the per-block
    win_pad path and the legacy ragged path — forward and vision-param
    gradients — on a ragged mixed image+video batch at a static budget,
    in both unrolled and scanned-block forms."""
    from rga3_tpu.models.qwen25vl.vision import QwenVisionTower

    cfg = tiny_config(vocab_size=300).vision.replace(
        window_size=56, fullatt_block_indexes=(1,)
    )
    grids = [(1, 6, 10), (2, 4, 6)]
    rng = np.random.default_rng(9)
    patches = rng.normal(size=(108, 3 * 2 * 14 * 14)).astype(np.float32)
    layout = compute_vision_layout(grids, cfg)
    assert (layout.win_pad_units < 0).any()
    padded, la_p = pad_vision_inputs(patches, layout, cfg, 128)
    la_p = {k: jnp.asarray(v) for k, v in la_p.items()}
    la_legacy = {
        k: v for k, v in la_p.items() if k not in ("win_pad", "win_unpad")
    }

    # only REAL merged rows reach the LLM (scatter_vision_tokens
    # consumes exactly n_real rows); budget-pad rows are zeros in
    # resident mode vs benign residual garbage in the other paths
    n_real = len(patches) // cfg.merge_unit
    tower = QwenVisionTower(cfg)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(padded), **la_p)
    base = tower.apply(params, jnp.asarray(padded), **la_legacy)
    tower_r = QwenVisionTower(cfg.replace(window_resident=True))
    out_r = jax.jit(
        lambda p, x: tower_r.apply(p, x, **la_p)
    )(params, jnp.asarray(padded))
    np.testing.assert_allclose(
        np.asarray(out_r)[:n_real], np.asarray(base)[:n_real],
        rtol=2e-4, atol=2e-4,
    )

    # gradients — the loss reads only the real rows, as the LLM does
    n_out = int(base.shape[0])
    w_out = rng.normal(size=(n_out, cfg.out_hidden_size)).astype(
        np.float32
    )
    w_out[n_real:] = 0.0
    w_out = jnp.asarray(w_out)

    def grads_of(t, la):
        return jax.jit(jax.grad(
            lambda p, x: jnp.sum(t.apply(p, x, **la) * w_out)
        ))(params, jnp.asarray(padded))

    g_r = grads_of(tower_r, la_p)
    g_base = grads_of(tower, la_legacy)
    flat_base = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_base)
    }
    for k, v in jax.tree_util.tree_leaves_with_path(g_r):
        ref = flat_base[jax.tree_util.keystr(k)]
        scale = max(float(jnp.max(jnp.abs(ref))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), rtol=5e-4, atol=5e-4 * scale,
            err_msg=jax.tree_util.keystr(k),
        )

    # scanned-blocks resident form
    from rga3_tpu.models.qwen25vl.loader import stack_qwen_layers

    tower_rs = QwenVisionTower(
        cfg.replace(window_resident=True, scan_blocks=True)
    )
    stacked = stack_qwen_layers(
        {"params": {"lm": {"model": {}}, "visual": params["params"]}},
        stack_vision=True,
    )
    out_rs = tower_rs.apply(
        {"params": stacked["params"]["visual"]}, jnp.asarray(padded),
        **la_p,
    )
    np.testing.assert_allclose(
        np.asarray(out_rs)[:n_real], np.asarray(base)[:n_real],
        rtol=2e-4, atol=2e-4,
    )


def test_uint8_ship_bit_identical_to_f32():
    """ship_uint8 path: preprocess_frames(normalize=False) uint8 patches
    + on-device CLIP normalization produce BIT-identical logits to the
    host-normalized f32 path, unpadded and at a static budget (the resize
    output is integer-valued, and the tower replays the same f32 ops)."""
    from rga3_tpu.data.processor import preprocess_frames

    cfg = tiny_config(vocab_size=160_000)
    model = Qwen25VL(cfg)
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)]
    min_px, max_px = 4 * 28 * 28, 4 * 28 * 28  # pin the 2x2 merged grid
    pf32, grid = preprocess_frames(frames, min_px, max_px)
    pu8, grid_u = preprocess_frames(frames, min_px, max_px,
                                    normalize=False)
    assert grid == grid_u and pu8.dtype == np.uint8
    # host-side check: normalizing the u8 patches reproduces pf32 exactly
    mean = np.repeat(
        np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32) * 255,
        pu8.shape[1] // 3,
    )
    std = np.repeat(
        np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32) * 255,
        pu8.shape[1] // 3,
    )
    assert ((pu8.astype(np.float32) - mean) / std == pf32).all()

    n_vis = grid[0] * grid[1] * grid[2] // 4
    ids = rng.integers(0, 1000, size=(1, 8 + n_vis)).astype(np.int32)
    ids[0, 2] = cfg.vision_start_token_id
    ids[0, 3 : 3 + n_vis] = cfg.image_token_id
    pos, _ = get_rope_index(cfg, ids, image_grid_thw=[grid])
    layout = compute_vision_layout([grid], cfg.vision)
    la = layout_device_args(layout, cfg.vision)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.asarray(ids),
        pixel_patches=jnp.asarray(pf32), vision_layout=la,
    )

    def logits(patches, lay):
        return np.asarray(model.apply(
            params, input_ids=jnp.asarray(ids),
            position_ids=jnp.asarray(pos),
            pixel_patches=jnp.asarray(patches),
            vision_layout=lay,
        )["logits"])

    base = logits(pf32, la)
    assert (logits(pu8, la) == base).all(), "u8 unpadded != f32"

    budget = pf32.shape[0] + 16
    padded32, la32 = pad_vision_inputs(pf32, layout, cfg.vision, budget)
    padded8, la8 = pad_vision_inputs(pu8, layout, cfg.vision, budget)
    assert padded8.dtype == np.uint8
    j32 = {k: jnp.asarray(v) for k, v in la32.items()}
    j8 = {k: jnp.asarray(v) for k, v in la8.items()}
    assert (logits(padded8, j8) == logits(padded32, j32)).all(), (
        "u8 budget-padded != f32 budget-padded"
    )
