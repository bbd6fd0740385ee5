"""Fused windowed transformer block: numerics, gradients, param-tree
identity with the unfused Hiera path (ref model/sam2.py:1034-1148)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rga3_tpu.models.sam2.config import tiny_sam2_config
from rga3_tpu.models.sam2.hiera import (
    Hiera,
    MultiScaleBlock,
    window_partition,
    window_unpartition,
)
from rga3_tpu.ops.fused_block import _reference_block, fused_window_block


def _params(rng, D, F):
    p = {
        "ln1_g": rng.normal(size=(D,)) * 0.1 + 1,
        "ln1_b": rng.normal(size=(D,)) * 0.1,
        "wqkv": rng.normal(size=(D, 3 * D)) * 0.1,
        "bqkv": rng.normal(size=(3 * D,)) * 0.1,
        "wproj": rng.normal(size=(D, D)) * 0.1,
        "bproj": rng.normal(size=(D,)) * 0.1,
        "ln2_g": rng.normal(size=(D,)) * 0.1 + 1,
        "ln2_b": rng.normal(size=(D,)) * 0.1,
        "w1": rng.normal(size=(D, F)) * 0.1,
        "b1": rng.normal(size=(F,)) * 0.1,
        "w2": rng.normal(size=(F, D)) * 0.1,
        "b2": rng.normal(size=(D,)) * 0.1,
    }
    return {k: jnp.asarray(v.astype(np.float32)) for k, v in p.items()}


def test_interpret_kernel_matches_reference():
    rng = np.random.default_rng(0)
    B, L, D, H, W = 2, 128, 64, 4, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    p = _params(rng, D, 4 * D)
    ref = _reference_block(
        x, p, num_heads=H, window=W, eps=1e-6, scale=1 / np.sqrt(D // H)
    )
    for blk in (64, 16):  # block > window (masked) and block == window
        got = fused_window_block(
            x, p, num_heads=H, window=W, interpret=True, block_q=blk
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_fused_matches_flax_block():
    rng = np.random.default_rng(1)
    B, side, D, H, ws = 2, 16, 64, 4, 4
    cfg = dataclasses.replace(
        tiny_sam2_config().hiera, use_fused_block=False,
        use_window_kernel=False,
    )
    blk = MultiScaleBlock(
        cfg, dim=D, dim_out=D, num_heads=H, window_size=ws, do_q_pool=False
    )
    x2d = jnp.asarray(rng.normal(size=(B, side, side, D)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(1), x2d)
    flax_out = blk.apply(params, x2d)

    t = params["params"]
    p = {
        "ln1_g": t["norm1"]["scale"], "ln1_b": t["norm1"]["bias"],
        "wqkv": t["attn_qkv"]["kernel"], "bqkv": t["attn_qkv"]["bias"],
        "wproj": t["attn_proj"]["kernel"], "bproj": t["attn_proj"]["bias"],
        "ln2_g": t["norm2"]["scale"], "ln2_b": t["norm2"]["bias"],
        "w1": t["mlp_layers_0"]["kernel"], "b1": t["mlp_layers_0"]["bias"],
        "w2": t["mlp_layers_1"]["kernel"], "b2": t["mlp_layers_1"]["bias"],
    }
    xin, pad_hw = window_partition(x2d, ws)
    nwin = xin.shape[0] // B
    tok = xin.reshape(B, nwin * ws * ws, D)
    fused = fused_window_block(tok, p, num_heads=H, window=ws * ws)
    out2d = window_unpartition(
        fused.reshape(B * nwin, ws, ws, D), ws, pad_hw, (side, side)
    )
    np.testing.assert_allclose(
        np.asarray(out2d), np.asarray(flax_out), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_hiera_fused_path_parity_and_tree():
    """Fused path == unfused path on the full tiny trunk, with an
    IDENTICAL parameter tree (checkpoint compatibility)."""
    base = tiny_sam2_config().hiera
    cfg_on = dataclasses.replace(base, use_fused_block=True)
    cfg_off = dataclasses.replace(
        base, use_fused_block=False, use_window_kernel=False
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    m_on, m_off = Hiera(cfg_on), Hiera(cfg_off)
    p = m_on.init(jax.random.PRNGKey(0), x)
    p_off = m_off.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: a.shape, p) == jax.tree.map(
        lambda a: a.shape, p_off
    )
    for a, b in zip(m_on.apply(p, x), m_off.apply(p, x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


@pytest.mark.slow
def test_fused_block_is_differentiable():
    """jax.grad must work through the fused path (UniGR training takes
    grad over the full param tree; on TPU this exercises the custom_vjp —
    on CPU the natively-differentiable reference fallback)."""
    rng = np.random.default_rng(3)
    B, L, D, H, W = 2, 64, 32, 2, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    p = _params(rng, D, 4 * D)

    def loss(p, x):
        return jnp.sum(fused_window_block(x, p, num_heads=H, window=W) ** 2)

    g = jax.grad(loss)(p, x)
    gr = jax.grad(
        lambda p, x: jnp.sum(
            _reference_block(
                x, p, num_heads=H, window=W, eps=1e-6,
                scale=1 / np.sqrt(D // H),
            ) ** 2
        )
    )(p, x)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(g[k]), np.asarray(gr[k]), rtol=1e-3, atol=1e-3
        )
        assert np.isfinite(np.asarray(g[k])).all()


def test_global_block_interpret_matches_reference():
    from rga3_tpu.ops.fused_block import (
        _reference_global_block,
        fused_global_block,
    )

    rng = np.random.default_rng(4)
    B, L, D, H = 2, 128, 64, 4
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    p = _params(rng, D, 4 * D)
    ref = _reference_global_block(
        x, p, num_heads=H, eps=1e-6, scale=1 / np.sqrt(D // H)
    )
    got = fused_global_block(
        x, p, num_heads=H, interpret=True, block_q=64
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_global_block_is_differentiable():
    from rga3_tpu.ops.fused_block import (
        _reference_global_block,
        fused_global_block,
    )

    rng = np.random.default_rng(5)
    B, L, D, H = 2, 64, 32, 2
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    p = _params(rng, D, 4 * D)

    g = jax.grad(
        lambda p, x: jnp.sum(
            fused_global_block(x, p, num_heads=H) ** 2
        )
    )(p, x)
    gr = jax.grad(
        lambda p, x: jnp.sum(
            _reference_global_block(
                x, p, num_heads=H, eps=1e-6, scale=1 / np.sqrt(D // H)
            ) ** 2
        )
    )(p, x)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(g[k]), np.asarray(gr[k]), rtol=1e-3, atol=1e-3
        )


def test_polynomial_erf_accuracy():
    from rga3_tpu.ops.fused_block import _erf_poly

    x = jnp.linspace(-6, 6, 4001)
    err = np.abs(np.asarray(_erf_poly(x)) - np.asarray(jax.lax.erf(x)))
    # 1.5e-7 in exact arithmetic (A&S 7.1.26); f32 rounding brings it to
    # ~4e-7 — still 4 orders below bf16 resolution
    assert err.max() < 1e-6, err.max()


def test_split_interpret_kernel_matches_reference():
    """Split fusion (wide-dim path): prologue/attention/proj-LN/blocked-MLP
    kernels vs the XLA reference, incl. multi-f-block accumulation."""
    from rga3_tpu.ops.fused_block import fused_window_block_split

    rng = np.random.default_rng(2)
    B, L, D, H, W = 2, 128, 64, 4, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    p = _params(rng, D, 4 * D)
    ref = _reference_block(
        x, p, num_heads=H, window=W, eps=1e-6, scale=1 / np.sqrt(D // H)
    )
    for blk, bf in ((64, 256), (64, 64), (16, 128)):
        got = fused_window_block_split(
            x, p, num_heads=H, window=W, interpret=True,
            block_q=blk, block_f=bf,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


@pytest.mark.slow
def test_split_block_gradients_match_reference():
    from rga3_tpu.ops.fused_block import fused_window_block_split

    rng = np.random.default_rng(3)
    B, L, D, H, W = 1, 64, 32, 2, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    p = _params(rng, D, 4 * D)

    def f_ref(x_, p_):
        return jnp.sum(
            _reference_block(
                x_, p_, num_heads=H, window=W, eps=1e-6,
                scale=1 / np.sqrt(D // H),
            ) ** 2
        )

    def f_split(x_, p_):
        # no interpret: on TPU exercises the custom_vjp, on CPU the
        # natively-differentiable reference fallback (same convention as
        # test_fused_block_is_differentiable)
        return jnp.sum(
            fused_window_block_split(
                x_, p_, num_heads=H, window=W, block_q=32, block_f=32,
            ) ** 2
        )

    gx_ref, gp_ref = jax.grad(f_ref, argnums=(0, 1))(x, p)
    gx, gp = jax.grad(f_split, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=2e-3, atol=2e-3
    )
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), rtol=2e-3, atol=2e-3,
            err_msg=k,
        )


def _trans_params(rng, CI, CO, F):
    p = {
        "ln1_g": rng.normal(size=(CI,)) * 0.1 + 1,
        "ln1_b": rng.normal(size=(CI,)) * 0.1,
        "wproj": rng.normal(size=(CI, CO)) * 0.1,
        "bproj": rng.normal(size=(CO,)) * 0.1,
        "wqkv": rng.normal(size=(CI, 3 * CO)) * 0.1,
        "bqkv": rng.normal(size=(3 * CO,)) * 0.1,
        "wattn": rng.normal(size=(CO, CO)) * 0.1,
        "battn": rng.normal(size=(CO,)) * 0.1,
        "ln2_g": rng.normal(size=(CO,)) * 0.1 + 1,
        "ln2_b": rng.normal(size=(CO,)) * 0.1,
        "w1": rng.normal(size=(CO, F)) * 0.1,
        "b1": rng.normal(size=(F,)) * 0.1,
        "w2": rng.normal(size=(F, CO)) * 0.1,
        "b2": rng.normal(size=(CO,)) * 0.1,
    }
    return {k: jnp.asarray(v.astype(np.float32)) for k, v in p.items()}


@pytest.mark.slow
@pytest.mark.midlane
def test_transition_interpret_matches_reference():
    from rga3_tpu.ops.fused_block import (
        _reference_transition, fused_transition_block,
    )

    rng = np.random.default_rng(3)
    B, n_win, ws, CI, CO, H = 2, 4, 4, 32, 64, 4
    L = n_win * ws * ws
    x = jnp.asarray(rng.normal(size=(B, L, CI)).astype(np.float32))
    p = _trans_params(rng, CI, CO, 4 * CO)
    ref = _reference_transition(
        x, p, num_heads=H, ws=ws, eps=1e-6, scale=1 / np.sqrt(CO // H)
    )
    assert ref.shape == (B, n_win * (ws // 2) ** 2, CO)
    for k_w in (1, 2, 4):  # unmasked and masked multi-window blocks
        got = fused_transition_block(
            x, p, num_heads=H, ws=ws, interpret=True, block_windows=k_w
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_fused_transition_matches_flax_block():
    """New fused-transition branch == the unfused q-pool path, with an
    identical parameter tree (checkpoint compatibility)."""
    rng = np.random.default_rng(4)
    B, side, CI, CO, H, ws = 2, 16, 32, 64, 4, 4
    base = tiny_sam2_config().hiera
    cfg_on = dataclasses.replace(
        base, use_fused_block=True, use_fused_transition=True
    )
    cfg_off = dataclasses.replace(
        base, use_fused_block=False, use_window_kernel=False
    )
    x2d = jnp.asarray(
        rng.normal(size=(B, side, side, CI)).astype(np.float32)
    )
    mk = lambda c: MultiScaleBlock(
        c, dim=CI, dim_out=CO, num_heads=H, window_size=ws, do_q_pool=True
    )
    params = mk(cfg_on).init(jax.random.PRNGKey(5), x2d)
    p_off = mk(cfg_off).init(jax.random.PRNGKey(5), x2d)
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(
        lambda a: a.shape, p_off
    )
    on = mk(cfg_on).apply(params, x2d)
    off = mk(cfg_off).apply(params, x2d)
    assert on.shape == (B, side // 2, side // 2, CO)
    np.testing.assert_allclose(
        np.asarray(on), np.asarray(off), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
@pytest.mark.midlane
def test_fused_transition_is_differentiable():
    rng = np.random.default_rng(5)
    B, side, CI, CO, H, ws = 1, 8, 16, 32, 2, 4
    cfg = dataclasses.replace(
        tiny_sam2_config().hiera, use_fused_block=True,
        use_fused_transition=True,
    )
    blk = MultiScaleBlock(
        cfg, dim=CI, dim_out=CO, num_heads=H, window_size=ws, do_q_pool=True
    )
    x2d = jnp.asarray(rng.normal(size=(B, side, side, CI)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(6), x2d)

    def loss(p, xx):
        return jnp.sum(blk.apply(p, xx) ** 2)

    g = jax.grad(loss)(params, x2d)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_transition_block_sizing_hiera_l_shapes():
    """Pin the transition kernel's windows-per-step choice at the real
    Hiera-L 1024^2 stage-entry shapes so estimator regressions are caught
    on CPU. The r2b chip session OOMed the 16 MiB scoped-vmem compile at
    the stage-3 entry because the estimate missed the f32 matmul outputs;
    the fix must keep every chosen step's estimate under the Mosaic
    ceiling with margin."""
    from rga3_tpu.ops.fused_block import (
        _pick_transition_block_windows,
        _transition_vmem_limit_bytes,
        transition_vmem_bytes,
    )

    # (n_win, win, c_in, c_out, f) as MultiScaleBlock passes them at
    # image_size 1024. Stage entries use the PREVIOUS stage's window spec
    # (hiera.py: window size lags one block behind the stage transition),
    # so with window_spec (8, 4, 16, 8): block 2 ws=8, block 8 ws=4,
    # block 44 ws=16.
    cases = [
        # block 2: 256x256 tokens, ws=8, 144 -> 288
        ((256 * 256) // 64, 64, 144, 288, 4 * 288),
        # block 8: 128x128 tokens, ws=4, 288 -> 576 (the r2b OOM block)
        ((128 * 128) // 16, 16, 288, 576, 4 * 576),
        # block 44: 64x64 tokens, ws=16, 576 -> 1152 (29 MB of weights:
        # only representable at all because of the raised Mosaic ceiling)
        ((64 * 64) // 256, 256, 576, 1152, 4 * 1152),
    ]
    limit = _transition_vmem_limit_bytes() - 4 * 2**20
    for n_win, win, c_in, c_out, f in cases:
        k_w = _pick_transition_block_windows(n_win, win, c_in, c_out, f)
        assert k_w is not None, (n_win, win, c_in, c_out)
        assert n_win % k_w == 0
        est = transition_vmem_bytes(k_w, win, c_in, c_out, f)
        assert est <= limit, (k_w, est, limit)
    # the r2b failure: at block 8 the old estimator picked a step whose
    # true footprint was 17.34M (> the 16 MiB default scope); the honest
    # estimate must keep the chosen step within the sizing budget
    k_w = _pick_transition_block_windows(1024, 16, 288, 576, 2304)
    assert transition_vmem_bytes(k_w, 16, 288, 576, 2304) <= 14 * 2**20
