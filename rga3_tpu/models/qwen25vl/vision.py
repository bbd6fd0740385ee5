"""Qwen2.5-VL windowed-attention vision encoder in flax.linen.

JAX rebuild of the HF vision tower the reference depends on (SURVEY.md §2.3:
windowed ViT with dynamic-resolution pixel budgeting, M-RoPE plumbed through
`grid_thw`). The dynamic-resolution token counts fight XLA's static shapes
(SURVEY.md §7 hard part 3); strategy here:

  * Host side (numpy, `compute_vision_layout`): window reordering indices,
    per-window segment ids, and 2D rotary position tables for a given
    `grid_thw`. These are data, not weights — the device kernel is compiled
    per padded bucket length.
  * Device side: patch embedding (the Conv3d expressed as one matmul on
    pre-extracted patches — MXU-friendly), `depth` blocks where window
    blocks use segment-id flash attention over window segments and
    full-attention blocks use per-grid segment ids, then the 2×2 spatial
    merger MLP.

Token order convention matches HF exactly: patches arrive in merge-unit
order ((h/2, w/2, 2, 2) within each t slice), windows regroup merge units
into 4×4-unit tiles (window_size // spatial_merge_size // patch_size).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import flash_attention, mha_reference
from ...ops.rope import apply_rope, vision_rope_cos_sin
from .config import QwenVisionConfig


class VisionLayout(NamedTuple):
    """Host-computed layout for one batch of grids (images/video clips)."""

    window_index: np.ndarray  # (L_merged,) permutation of merge units
    reverse_index: np.ndarray  # (L_merged,) inverse permutation
    window_seg: np.ndarray  # (L_tokens,) segment id per window-ordered token
    grid_seg: np.ndarray  # (L_tokens,) segment id per grid (full-att blocks)
    hpos: np.ndarray  # (L_tokens,) window-ordered h coords
    wpos: np.ndarray  # (L_tokens,) window-ordered w coords
    total_tokens: int
    # uniform-window attention gathers (windowed blocks run batched
    # per-window attention over windows padded to the full tile — edge
    # windows are ragged, so flash-with-segment-ids paid ~10 ms/step of
    # kernel overhead at the release video budget; see STATUS r3):
    win_pad_units: np.ndarray  # (n_win * tile_units,) valid window-ordered
    # unit index, or -1 for a window-pad slot
    win_unpad_units: np.ndarray  # (L_merged,) padded-stream unit position
    # of each valid window-ordered unit


def _grid_pos_ids(t: int, h: int, w: int, sms: int) -> np.ndarray:
    """Patch (h, w) coords in merge-unit order, repeated t times.

    Matches HF `rot_pos_emb`: reshape (h/sms, sms, w/sms, sms) and permute to
    (h/sms, w/sms, sms, sms)."""
    hpos = np.arange(h)[:, None].repeat(w, 1)
    wpos = np.arange(w)[None, :].repeat(h, 0)

    def perm(p):
        return (
            p.reshape(h // sms, sms, w // sms, sms)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    hp, wp = perm(hpos), perm(wpos)
    return np.stack(
        [np.tile(hp, t), np.tile(wp, t)], axis=-1
    )  # (t*h*w, 2)


def compute_vision_layout(
    grid_thw: Sequence[Tuple[int, int, int]], cfg: QwenVisionConfig
) -> VisionLayout:
    """Window reorder + segments + rotary coords for a list of grids.

    Equivalent of HF `get_window_index` + `rot_pos_emb` (consumed by the
    reference through transformers — SURVEY.md §2.3), done once on host.
    """
    sms = cfg.spatial_merge_size
    unit = cfg.merge_unit
    wsize = cfg.window_size // sms // cfg.patch_size  # merged units per side

    window_index: List[np.ndarray] = []
    window_seqlens: List[int] = []  # tokens per window (valid only)
    grid_seqlens: List[int] = []
    pos_list: List[np.ndarray] = []
    win_pad_rows: List[np.ndarray] = []  # per window: tile_units slots,
    # each a valid window-ordered unit index or -1 (window-pad)
    tile_units = wsize * wsize
    valid_units = 0
    start = 0
    for t, h, w in grid_thw:
        lh, lw = h // sms, w // sms
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % wsize
        pad_w = (-lw) % wsize
        idx_p = np.pad(
            idx, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-100
        )
        nwh, nww = (lh + pad_h) // wsize, (lw + pad_w) // wsize
        idx_p = idx_p.reshape(t, nwh, wsize, nww, wsize)
        idx_p = idx_p.transpose(0, 1, 3, 2, 4).reshape(
            t * nwh * nww, wsize * wsize
        )
        for row in idx_p:
            valid = row[row != -100]
            window_index.append(valid + start)
            window_seqlens.append(len(valid) * unit)
            slots = np.full(tile_units, -1, np.int64)
            slots[: len(valid)] = np.arange(
                valid_units, valid_units + len(valid)
            )
            win_pad_rows.append(slots)
            valid_units += len(valid)
        start += t * lh * lw
        grid_seqlens.append(t * h * w)
        pos_list.append(_grid_pos_ids(t, h, w, sms))

    win_pad_units = np.concatenate(win_pad_rows)
    pos_of_valid = np.nonzero(win_pad_units >= 0)[0]
    win_unpad_units = pos_of_valid[
        np.argsort(win_pad_units[pos_of_valid])
    ]

    window_index_np = np.concatenate(window_index)
    reverse_index = np.argsort(window_index_np)

    window_seg = np.repeat(
        np.arange(len(window_seqlens)), np.asarray(window_seqlens)
    )
    grid_seg_natural = np.repeat(
        np.arange(len(grid_seqlens)), np.asarray(grid_seqlens)
    )

    # positions are defined in natural (merge-unit) order; reorder tokens
    pos = np.concatenate(pos_list, axis=0)  # (L_tokens, 2) natural order
    total = pos.shape[0]
    token_perm = (
        window_index_np[:, None] * unit + np.arange(unit)[None, :]
    ).reshape(-1)
    pos_w = pos[token_perm]
    grid_seg = grid_seg_natural[token_perm]

    return VisionLayout(
        window_index=window_index_np,
        reverse_index=reverse_index,
        window_seg=window_seg.astype(np.int32),
        grid_seg=grid_seg.astype(np.int32),
        hpos=pos_w[:, 0].astype(np.int32),
        wpos=pos_w[:, 1].astype(np.int32),
        total_tokens=total,
        win_pad_units=win_pad_units.astype(np.int32),
        win_unpad_units=win_unpad_units.astype(np.int32),
    )


class VisionRMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "weight", nn.initializers.ones, (x.shape[-1],), jnp.float32
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return (x32 * jnp.sqrt(1.0 / (var + self.eps)) * scale).astype(x.dtype)


def _uniform_window_attention(q, k, v, win_pad, win_unpad, tile: int):
    """Batched per-window attention over windows padded to full tiles.

    q/k/v (L, H, hd) in valid window order; win_pad (Lp,) gathers each
    padded-window slot's token (-1 -> zero fill, masked as keys via
    kv segment ids); win_unpad (L,) gathers each valid token's output
    back (-1 for budget-pad tokens -> 0). Profiled round 3: segment-id
    flash over ragged 64-token windows cost ~0.31 ms/layer at L=1280
    (45% of the vision tower, grid-machinery-bound — neither block size
    nor kv-block skipping moved it); per-window (tile x tile) XLA
    einsum logits are tiny and fuse."""
    l, h, hd = q.shape
    lp = win_pad.shape[0]
    nw = lp // tile

    def gather(t):
        return jnp.take(t, win_pad, axis=0, mode="fill", fill_value=0)

    qw = gather(q).reshape(nw, tile, h, hd)
    kw = gather(k).reshape(nw, tile, h, hd)
    vw = gather(v).reshape(nw, tile, h, hd)
    kv_seg = (win_pad < 0).astype(jnp.int32).reshape(nw, tile)
    aw = mha_reference(
        qw, kw, vw,
        segment_ids=jnp.zeros_like(kv_seg), kv_segment_ids=kv_seg,
    )
    return jnp.take(
        aw.reshape(lp, h, hd), win_unpad, axis=0, mode="fill",
        fill_value=0,
    )


class VisionBlock(nn.Module):
    cfg: QwenVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, segment_ids, win_pad=None,
                 win_unpad=None, use_full=True, resident_kv_seg=None):
        """use_full: True -> full attention over `segment_ids` grids;
        False -> uniform-window attention via win_pad/win_unpad; a traced
        scalar -> lax.cond between the two (the scanned-blocks path —
        attention has no params, so the branches share everything).

        resident_kv_seg (n_win, tile) set -> window-RESIDENT mode: x is
        already in padded window order, window attention is a bare
        reshape (no gathers), full attention uses `segment_ids` whose
        pad slots are -1."""
        cfg = self.cfg
        l, d = x.shape
        h, hd = cfg.num_heads, cfg.head_dim

        def dense(name, features):
            if cfg.quant_int8:
                from .language import QuantDense

                return QuantDense(
                    features, use_bias=True, name=name,
                    w8a8_min_seq=(
                        32 if getattr(cfg, "quant_w8a8", False) else 0
                    ),
                )
            return nn.Dense(
                features, use_bias=True, dtype=x.dtype,
                param_dtype=jnp.float32, name=name,
            )

        normed = VisionRMSNorm(cfg.rms_norm_eps, name="norm1")(x)
        qkv = dense("attn_qkv", 3 * d)(normed)
        q, k, v = jnp.split(qkv.reshape(l, 3, h, hd), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]  # (L, H, hd)
        q = apply_rope(q[None], cos[None], sin[None])[0]
        k = apply_rope(k[None], cos[None], sin[None])[0]
        tile = (cfg.window_size // cfg.patch_size) ** 2

        def full_attn(qkv_):
            q_, k_, v_ = qkv_
            return flash_attention(
                q_[None], k_[None], v_[None],
                causal=False, segment_ids=segment_ids[None],
            )[0]

        def window_attn(qkv_):
            q_, k_, v_ = qkv_
            if resident_kv_seg is not None:
                nw = l // tile
                aw = mha_reference(
                    q_.reshape(nw, tile, h, hd),
                    k_.reshape(nw, tile, h, hd),
                    v_.reshape(nw, tile, h, hd),
                    segment_ids=jnp.zeros_like(resident_kv_seg),
                    kv_segment_ids=resident_kv_seg,
                )
                return aw.reshape(l, h, hd)
            return _uniform_window_attention(
                q_, k_, v_, win_pad, win_unpad, tile
            )

        if win_pad is None and resident_kv_seg is None:
            # legacy path: ragged windows via segment-id flash
            attn = full_attn((q, k, v))
        elif use_full is True:
            attn = full_attn((q, k, v))
        elif use_full is False:
            attn = window_attn((q, k, v))
        else:  # traced (scanned blocks)
            attn = jax.lax.cond(
                use_full, full_attn, window_attn, (q, k, v)
            )
        attn = dense("attn_proj", d)(attn.reshape(l, d))
        x = x + attn

        normed = VisionRMSNorm(cfg.rms_norm_eps, name="norm2")(x)
        gate = dense("mlp_gate", cfg.intermediate_size)(normed)
        up = dense("mlp_up", cfg.intermediate_size)(normed)
        down = dense("mlp_down", d)(nn.silu(gate) * up)
        return x + down


class QwenVisionTower(nn.Module):
    """Full vision tower over window-ordered patch tokens.

    Inputs are produced host-side: `pixel_patches` (L, in_channels *
    temporal_patch_size * patch_size²) in natural merge-unit order, plus a
    VisionLayout. Output: merged tokens (L/4, out_hidden_size) in natural
    order (ready to scatter into the LLM sequence).
    """

    cfg: QwenVisionConfig

    @nn.compact
    def __call__(
        self,
        pixel_patches: jnp.ndarray,
        hpos: jnp.ndarray,
        wpos: jnp.ndarray,
        window_seg: jnp.ndarray,
        grid_seg: jnp.ndarray,
        token_perm: jnp.ndarray,  # natural->window order token permutation
        merged_reverse: jnp.ndarray,  # window->natural merged-unit inverse
        compute_dtype=jnp.float32,
        win_pad: Optional[jnp.ndarray] = None,
        win_unpad: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        if pixel_patches.dtype == jnp.uint8:
            # ship_uint8 path (QwenVLProcessor): patches arrive as raw
            # resized uint8 and CLIP-normalize HERE, in the same f32 ops
            # the host path uses — bit-identical output at 4x fewer
            # host->device bytes. Per-dim mean/std: the patch layout's
            # last axes are (c, tps, ps, ps), so each channel constant
            # repeats over tps*ps*ps contiguous dims.
            from ...data.processor import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

            reps = pixel_patches.shape[-1] // 3
            mean = np.repeat(
                np.asarray(OPENAI_CLIP_MEAN, np.float32) * 255.0, reps
            )
            std = np.repeat(
                np.asarray(OPENAI_CLIP_STD, np.float32) * 255.0, reps
            )
            pixel_patches = (
                pixel_patches.astype(jnp.float32) - mean
            ) / std
        x = nn.Dense(
            cfg.hidden_size, use_bias=False, dtype=compute_dtype,
            param_dtype=jnp.float32, name="patch_embed",
        )(pixel_patches.astype(compute_dtype))

        x = x[token_perm]  # reorder into window order

        resident = cfg.window_resident and win_pad is not None
        kv_seg = None
        tile = (cfg.window_size // cfg.patch_size) ** 2
        if resident:
            # one pad gather in; blocks then never gather (window attn
            # is a bare reshape). Pad slots carry zeros; they are masked
            # as keys everywhere and dropped by the final unpad gather.
            x = jnp.take(x, win_pad, axis=0, mode="fill", fill_value=0)
            hpos = jnp.take(hpos, win_pad, axis=0, mode="fill",
                            fill_value=0)
            wpos = jnp.take(wpos, win_pad, axis=0, mode="fill",
                            fill_value=0)
            grid_seg = jnp.where(
                win_pad >= 0,
                jnp.take(grid_seg, win_pad, axis=0, mode="fill",
                         fill_value=0),
                -1,
            )
            kv_seg = (win_pad < 0).astype(jnp.int32).reshape(-1, tile)
        cos, sin = vision_rope_cos_sin(hpos, wpos, cfg.head_dim)

        if cfg.scan_blocks:
            class ScannedBlock(nn.Module):
                cfg_: QwenVisionConfig

                @nn.compact
                def __call__(self, carry, use_full):
                    if win_pad is None:
                        # legacy layout args: ragged-window flash
                        seg = jnp.where(use_full, grid_seg, window_seg)
                        return (
                            VisionBlock(self.cfg_, name="block")(
                                carry, cos, sin, seg
                            ),
                            None,
                        )
                    if resident:
                        return (
                            VisionBlock(self.cfg_, name="block")(
                                carry, cos, sin, grid_seg,
                                use_full=use_full,  # traced -> lax.cond
                                resident_kv_seg=kv_seg,
                            ),
                            None,
                        )
                    return (
                        VisionBlock(self.cfg_, name="block")(
                            carry, cos, sin, grid_seg,
                            win_pad=win_pad, win_unpad=win_unpad,
                            use_full=use_full,  # traced -> lax.cond
                        ),
                        None,
                    )

            use_full = jnp.asarray(
                [i in cfg.fullatt_block_indexes for i in range(cfg.depth)]
            )
            scan_cls = nn.scan(
                ScannedBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=0,
                out_axes=0,
                length=cfg.depth,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )
            x, _ = scan_cls(cfg, name="blocks_scan")(x, use_full)
        else:
            for i in range(cfg.depth):
                full = i in cfg.fullatt_block_indexes
                if win_pad is None:
                    seg = grid_seg if full else window_seg
                    x = VisionBlock(cfg, name=f"blocks_{i}")(
                        x, cos, sin, seg
                    )
                elif resident:
                    x = VisionBlock(cfg, name=f"blocks_{i}")(
                        x, cos, sin, grid_seg,
                        use_full=full, resident_kv_seg=kv_seg,
                    )
                else:
                    x = VisionBlock(cfg, name=f"blocks_{i}")(
                        x, cos, sin, grid_seg,
                        win_pad=win_pad, win_unpad=win_unpad,
                        use_full=full,
                    )

        if resident:
            # one unpad gather out: padded window order -> valid window
            # order (budget-pad token rows -> 0, as in the per-block path)
            x = jnp.take(x, win_unpad, axis=0, mode="fill", fill_value=0)

        # merger: RMSNorm → concat 2x2 merge unit → MLP
        x = VisionRMSNorm(cfg.rms_norm_eps, name="merger_ln_q")(x)
        x = x.reshape(-1, cfg.merge_unit * cfg.hidden_size)
        x = nn.Dense(
            cfg.merge_unit * cfg.hidden_size, use_bias=True,
            dtype=compute_dtype, param_dtype=jnp.float32, name="merger_fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            cfg.out_hidden_size, use_bias=True, dtype=compute_dtype,
            param_dtype=jnp.float32, name="merger_fc2",
        )(x)
        return x[merged_reverse]  # back to natural order


def _win_token_arrays(
    win_pad_units: np.ndarray, win_unpad_units: np.ndarray, unit: int
):
    """Unit-level window gathers -> token-level (-1 stays -1)."""
    wp = win_pad_units.astype(np.int64)
    win_pad = np.where(
        wp[:, None] >= 0,
        wp[:, None] * unit + np.arange(unit)[None, :],
        -1,
    ).reshape(-1).astype(np.int32)
    up = win_unpad_units.astype(np.int64)
    win_unpad = (
        up[:, None] * unit + np.arange(unit)[None, :]
    ).reshape(-1).astype(np.int32)
    return win_pad, win_unpad


def layout_device_args(layout: VisionLayout, cfg: QwenVisionConfig):
    """Convert a VisionLayout into the device arrays QwenVisionTower takes."""
    unit = cfg.merge_unit
    token_perm = (
        layout.window_index[:, None] * unit + np.arange(unit)[None, :]
    ).reshape(-1)
    win_pad, win_unpad = _win_token_arrays(
        layout.win_pad_units, layout.win_unpad_units, unit
    )
    return dict(
        hpos=jnp.asarray(layout.hpos),
        wpos=jnp.asarray(layout.wpos),
        window_seg=jnp.asarray(layout.window_seg),
        grid_seg=jnp.asarray(layout.grid_seg),
        token_perm=jnp.asarray(token_perm),
        merged_reverse=jnp.asarray(layout.reverse_index),
        win_pad=jnp.asarray(win_pad),
        win_unpad=jnp.asarray(win_unpad),
    )


def win_budget_tokens(budget_tokens: int, cfg: QwenVisionConfig) -> int:
    """Static padded-window stream budget for a given token budget.

    Edge windows are padded to full tiles, so the window stream exceeds
    the valid token count by a grid-dependent margin (worst realistic
    case: small grids padding both axes, ~1.5x; asserted per batch in
    pad_vision_inputs). Rounded up to whole tiles."""
    tile = (cfg.window_size // cfg.patch_size) ** 2
    need = budget_tokens + budget_tokens // 2
    return -(-need // tile) * tile


def pad_vision_inputs(
    pixel_patches: np.ndarray,
    layout: VisionLayout,
    cfg: QwenVisionConfig,
    budget_tokens: int,
    win_budget: Optional[int] = None,
):
    """Pad ragged vision inputs to a fixed token budget for jitted steps.

    `budget_tokens` is the padded PATCH count (multiple of merge_unit).
    Padded patches form their own windows/grids via sentinel segment ids
    (-3/-4), so they never attend to real tokens; the merged-reverse
    permutation maps padded merge units onto the padded tail, which the
    scatter in model.py never gathers (input sequences contain only the
    real vision-pad tokens).

    The uniform-window gathers (`win_pad`/`win_unpad`) are padded to
    `win_budget` (default `win_budget_tokens(budget_tokens, cfg)`) with
    -1: budget-pad tokens are NOT gathered into any window — their
    attention output comes from the -1 -> fill(0) unpad gather, and they
    never reach the LM (the scatter skips them), so the sentinel-window
    semantics of window_seg are preserved without representing them.

    Returns (patches (budget, F) in pixel_patches' dtype — f32, or uint8
    on the ship_uint8 path — and layout_args dict of np arrays). Pad
    rows are zeros; they never reach attention or the LM either way.
    """
    assert budget_tokens % cfg.merge_unit == 0
    l = layout.total_tokens
    assert l <= budget_tokens, (l, budget_tokens)
    pad = budget_tokens - l
    unit = cfg.merge_unit
    token_perm = (
        layout.window_index[:, None] * unit + np.arange(unit)[None, :]
    ).reshape(-1)

    patches = np.zeros(
        (budget_tokens, pixel_patches.shape[1]), pixel_patches.dtype
    )
    patches[:l] = pixel_patches

    def pad1(x, fill):
        return np.concatenate(
            [x, np.full((pad,), fill, x.dtype)]
        ) if pad else x

    merged_l = l // unit
    merged_pad = pad // unit
    win_pad, win_unpad = _win_token_arrays(
        layout.win_pad_units, layout.win_unpad_units, unit
    )
    wb = win_budget if win_budget is not None else win_budget_tokens(
        budget_tokens, cfg
    )
    assert len(win_pad) <= wb, (
        f"padded-window stream {len(win_pad)} exceeds win_budget {wb}; "
        "raise win_budget (grids with extreme edge padding)"
    )
    win_pad = np.concatenate(
        [win_pad, np.full(wb - len(win_pad), -1, np.int32)]
    )
    win_unpad = np.concatenate(
        [win_unpad, np.full(budget_tokens - len(win_unpad), -1, np.int32)]
    )
    layout_args = dict(
        hpos=pad1(layout.hpos, 0),
        wpos=pad1(layout.wpos, 0),
        window_seg=pad1(layout.window_seg, -3),
        grid_seg=pad1(layout.grid_seg, -4),
        token_perm=pad1(token_perm.astype(np.int32), 0),
        merged_reverse=np.concatenate([
            layout.reverse_index.astype(np.int32),
            np.arange(merged_l, merged_l + merged_pad, dtype=np.int32),
        ]),
        win_pad=win_pad,
        win_unpad=win_unpad,
    )
    return patches, layout_args


def layout_device_args_np(layout: VisionLayout, cfg: QwenVisionConfig):
    unit = cfg.merge_unit
    token_perm = (
        layout.window_index[:, None] * unit + np.arange(unit)[None, :]
    ).reshape(-1).astype(np.int32)
    win_pad, win_unpad = _win_token_arrays(
        layout.win_pad_units, layout.win_unpad_units, unit
    )
    return dict(
        hpos=layout.hpos,
        wpos=layout.wpos,
        window_seg=layout.window_seg,
        grid_seg=layout.grid_seg,
        token_perm=token_perm,
        merged_reverse=layout.reverse_index.astype(np.int32),
        win_pad=win_pad,
        win_unpad=win_unpad,
    )
