"""Hiera hierarchical windowed ViT trunk (NHWC, flax.linen).

JAX rebuild of the reference trunk (ref: model/sam2.py:891-1245 — Hiera,
MultiScaleBlock, MultiScaleAttention, PatchEmbed, window partitioning,
q-pooling). At a fixed input size every window layout is static, so window
partition is pure reshape/transpose — no dynamic shapes for XLA.

Hiera-L: embed_dim 144, heads 2, stages (2,6,36,4), global-attention blocks
(23,33,43), window_spec (8,4,16,8), q_stride (2,2)
(ref: model/sam2.py:148-163).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import HieraConfig
from .layers import attend


def window_partition(x: jnp.ndarray, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero padding (ref :892-914)."""
    b, h, w, c = x.shape
    pad_h = (-h) % ws
    pad_w = (-w) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp // ws) * (wp // ws))
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _max_pool_2x2(x: jnp.ndarray, stride: Tuple[int, int]) -> jnp.ndarray:
    """nn.MaxPool2d(kernel=stride, stride=stride) on NHWC."""
    return nn.max_pool(
        x, window_shape=stride, strides=stride, padding="VALID"
    )


def patch_embed_s2d(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray
) -> jnp.ndarray:
    """7x7-stride-4-pad-3 patch embed (ref model/sam2.py PatchEmbed
    :943-976) computed as a 2x2 conv over a stride-4 space-to-depth
    image.

    The raw conv contracts over only 3 input channels — the MXU pads
    that to a full lane tile, so XLA runs it at ~1% utilization (4.3 ms
    of a 39.75 ms 2-frame trunk forward, bench_trunk_stages r4). In
    block coordinates of the stride, tap t in [0,7) of an output window
    starting at 4i-3 lands in s2d blocks i and i+1 only, so the conv is
    exactly a 2x2 stride-1 conv over (H/4, W/4, 48) with the 7x7x3
    kernel scattered into (2,2,48,C) (tap row/col 7 zero). Same math,
    192-wide contraction.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    s = 4
    # pad 3 left; right pad rounds the padded width up to a multiple of
    # 4 with one extra block for the 2-tap conv: 3 + H + 1 = H + 4
    xp = jnp.pad(x, ((0, 0), (3, 1), (3, 1), (0, 0)))
    hb, wb = h // s + 1, w // s + 1
    xp = xp.reshape(b, hb, s, wb, s, cin)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb, wb, s * s * cin)
    # kernel (7,7,cin,cout) -> (2,2,s*s*cin,cout), tap index 7 zero
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    k8 = k8.reshape(2, s, 2, s, cin, cout)
    k2 = k8.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, s * s * cin, cout)
    y = jax.lax.conv_general_dilated(
        xp, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


class MultiScaleBlock(nn.Module):
    cfg: HieraConfig
    dim: int
    dim_out: int
    num_heads: int
    window_size: int  # 0 = global attention
    do_q_pool: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ws = self.window_size
        if (
            not self.do_q_pool
            and self.dim == self.dim_out
            and cfg.use_fused_block
        ):
            if self.dim_out <= cfg.fused_block_max_dim:
                return self._fused(x) if ws > 0 else self._fused_global(x)
            if ws > 0 and cfg.use_split_fused_block:
                return self._fused(x, split=True)
        if (
            self.do_q_pool
            and self.dim != self.dim_out
            and ws > 0
            and cfg.use_fused_block
            and cfg.use_fused_transition
            and cfg.q_stride == (2, 2)
            and x.shape[1] % ws == 0
            and x.shape[2] % ws == 0
        ):
            # stage-entry transition block (q-pool + dim change); falls
            # back to the XLA mirror when weights exceed the VMEM budget
            return self._fused_transition(x)
        shortcut = x  # (B, H, W, C)
        normed = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)

        if self.dim != self.dim_out:
            proj = nn.Dense(self.dim_out, name="proj")(normed)
            shortcut = (
                _max_pool_2x2(proj, cfg.q_stride) if self.do_q_pool else proj
            )

        # window partition
        h, w = x.shape[1:3]
        b = x.shape[0]

        if ws > 0 and not self.do_q_pool and cfg.use_window_kernel:
            # local path: windows stay in the SEQUENCE (window-major), and
            # attention runs the block-diagonal Pallas kernel — no
            # per-window logits materialized in HBM
            from ...ops.attention import window_attention

            attn_in, pad_hw = window_partition(normed, ws)
            n_win = attn_in.shape[0] // b
            tokens = attn_in.reshape(b, n_win * ws * ws, -1)
            qkv = nn.Dense(3 * self.dim_out, name="attn_qkv")(tokens)
            qkv = qkv.reshape(
                b, n_win * ws * ws, 3, self.num_heads, -1
            )
            out = window_attention(
                qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], ws * ws
            )
            out = out.reshape(b * n_win, ws, ws, -1)
            out = nn.Dense(self.dim_out, name="attn_proj")(out)
            out = window_unpartition(out, ws, pad_hw, (h, w))
        else:
            if ws > 0:
                attn_in, pad_hw = window_partition(normed, ws)
            else:
                attn_in, pad_hw = normed, (h, w)

            # attention with optional q pooling
            b_, ah, aw, _ = attn_in.shape
            qkv = nn.Dense(3 * self.dim_out, name="attn_qkv")(attn_in)
            qkv = qkv.reshape(b_, ah * aw, 3, self.num_heads, -1)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if self.do_q_pool:
                hd = q.shape[-1]
                q = q.reshape(b_, ah, aw, self.num_heads * hd)
                q = _max_pool_2x2(q, cfg.q_stride)
                ah, aw = q.shape[1:3]
                q = q.reshape(b_, ah * aw, self.num_heads, hd)
            out = attend(q, k, v)
            out = out.reshape(b_, ah, aw, -1)
            out = nn.Dense(self.dim_out, name="attn_proj")(out)

            if self.do_q_pool:
                ws_out = ws // cfg.q_stride[0] if ws > 0 else 0
                h_out, w_out = shortcut.shape[1:3]
                if ws > 0:
                    pad_hw = (
                        h_out + ((-h_out) % ws_out),
                        w_out + ((-w_out) % ws_out),
                    )
                    out = window_unpartition(
                        out, ws_out, pad_hw, (h_out, w_out)
                    )
            else:
                if ws > 0:
                    out = window_unpartition(out, ws, pad_hw, (h, w))

        x = shortcut + out
        normed2 = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        hidden = nn.Dense(
            int(self.dim_out * cfg.mlp_ratio), name="mlp_layers_0"
        )(normed2)
        from ...ops.fused_block import gelu_variant

        hidden = nn.gelu(hidden, approximate=gelu_variant(cfg.gelu_tanh))
        out2 = nn.Dense(self.dim_out, name="mlp_layers_1")(hidden)
        return x + out2

    def _block_params(self, x: jnp.ndarray) -> dict:
        """Declare parameters through the SAME submodules as the unfused
        path (dummy calls, DCE'd by XLA) so the checkpoint tree is
        identical either way, and collect them for the fused kernels."""
        cfg = self.cfg
        d = self.dim_out
        z1 = jnp.zeros((1, self.dim), x.dtype)
        zd = jnp.zeros((1, d), x.dtype)
        nn.LayerNorm(epsilon=1e-6, name="norm1")(z1)
        nn.Dense(3 * d, name="attn_qkv")(z1)
        nn.Dense(d, name="attn_proj")(zd)
        nn.LayerNorm(epsilon=1e-6, name="norm2")(zd)
        hidden_dim = int(d * cfg.mlp_ratio)
        nn.Dense(hidden_dim, name="mlp_layers_0")(zd)
        nn.Dense(d, name="mlp_layers_1")(
            jnp.zeros((1, hidden_dim), x.dtype)
        )

        def g(name):
            return self.scope.get_variable("params", name)

        n1, n2 = g("norm1"), g("norm2")
        qkv, proj = g("attn_qkv"), g("attn_proj")
        m0, m1 = g("mlp_layers_0"), g("mlp_layers_1")
        return {
            "ln1_g": n1["scale"], "ln1_b": n1["bias"],
            "wqkv": qkv["kernel"].astype(x.dtype),
            "bqkv": qkv["bias"],
            "wproj": proj["kernel"].astype(x.dtype),
            "bproj": proj["bias"],
            "ln2_g": n2["scale"], "ln2_b": n2["bias"],
            "w1": m0["kernel"].astype(x.dtype), "b1": m0["bias"],
            "w2": m1["kernel"].astype(x.dtype), "b2": m1["bias"],
        }

    def _transition_params(self, x: jnp.ndarray) -> dict:
        """Parameter declaration for the q-pool transition block — same
        submodule names/shapes as the unfused path (dummy calls, DCE'd)."""
        cfg = self.cfg
        ci, co = self.dim, self.dim_out
        z1 = jnp.zeros((1, ci), x.dtype)
        zo = jnp.zeros((1, co), x.dtype)
        nn.LayerNorm(epsilon=1e-6, name="norm1")(z1)
        nn.Dense(co, name="proj")(z1)
        nn.Dense(3 * co, name="attn_qkv")(z1)
        nn.Dense(co, name="attn_proj")(zo)
        nn.LayerNorm(epsilon=1e-6, name="norm2")(zo)
        hidden_dim = int(co * cfg.mlp_ratio)
        nn.Dense(hidden_dim, name="mlp_layers_0")(zo)
        nn.Dense(co, name="mlp_layers_1")(
            jnp.zeros((1, hidden_dim), x.dtype)
        )

        def g(name):
            return self.scope.get_variable("params", name)

        n1, n2 = g("norm1"), g("norm2")
        proj, qkv = g("proj"), g("attn_qkv")
        aproj = g("attn_proj")
        m0, m1 = g("mlp_layers_0"), g("mlp_layers_1")
        return {
            "ln1_g": n1["scale"], "ln1_b": n1["bias"],
            "wproj": proj["kernel"].astype(x.dtype),
            "bproj": proj["bias"],
            "wqkv": qkv["kernel"].astype(x.dtype),
            "bqkv": qkv["bias"],
            "wattn": aproj["kernel"].astype(x.dtype),
            "battn": aproj["bias"],
            "ln2_g": n2["scale"], "ln2_b": n2["bias"],
            "w1": m0["kernel"].astype(x.dtype), "b1": m0["bias"],
            "w2": m1["kernel"].astype(x.dtype), "b2": m1["bias"],
        }

    def _fused_transition(self, x: jnp.ndarray) -> jnp.ndarray:
        """Fused q-pool transition path (LN+proj-pool-shortcut+qkv+pooled-q
        window attention+proj+LN+MLP in one kernel)."""
        from ...ops.fused_block import fused_transition_block

        params = self._transition_params(x)
        ws = self.window_size
        b, h, w = x.shape[:3]
        attn_in, pad_hw = window_partition(x, ws)
        n_win = attn_in.shape[0] // b
        tokens = attn_in.reshape(b, n_win * ws * ws, self.dim)
        out = fused_transition_block(
            tokens, params, num_heads=self.num_heads, ws=ws,
            gelu_tanh=self.cfg.gelu_tanh,
        )
        ws_out = ws // 2
        out = out.reshape(b * n_win, ws_out, ws_out, self.dim_out)
        return window_unpartition(
            out, ws_out, (pad_hw[0] // 2, pad_hw[1] // 2), (h // 2, w // 2)
        )

    def _fused_global(self, x: jnp.ndarray) -> jnp.ndarray:
        """Global-attention block: Pallas LN+qkv prologue, flash attention,
        Pallas proj+LN+MLP epilogue (full kv cannot sit in one VMEM
        block, so attention stays a separate flash kernel)."""
        from ...ops.fused_block import fused_global_block

        params = self._block_params(x)
        b, h, w, d = x.shape
        tokens = x.reshape(b, h * w, d)
        out = fused_global_block(
            tokens, params, num_heads=self.num_heads,
            gelu_tanh=self.cfg.gelu_tanh,
        )
        return out.reshape(b, h, w, d)

    def _fused(self, x: jnp.ndarray, split: bool = False) -> jnp.ndarray:
        """Whole-block fused Pallas path (LN+attn+proj+LN+MLP in one
        kernel, weights resident in VMEM); `split=True` uses the
        multi-kernel variant for dims whose weights exceed VMEM."""
        from ...ops.fused_block import (
            fused_window_block, fused_window_block_split,
        )

        d = self.dim_out
        params = self._block_params(x)
        ws = self.window_size
        b, h, w = x.shape[:3]
        attn_in, pad_hw = window_partition(x, ws)
        n_win = attn_in.shape[0] // b
        tokens = attn_in.reshape(b, n_win * ws * ws, d)
        window = ws * ws
        if split:
            # blocks sized for the 16 MB scoped-vmem limit at D=1152
            out = fused_window_block_split(
                tokens, params, num_heads=self.num_heads, window=window,
                gelu_tanh=self.cfg.gelu_tanh,
            )
        else:
            # block == window is mask-free; larger windows already fill
            # the MXU
            if window >= 256:
                block_q = self.cfg.fused_block_q_large or window
            else:
                block_q = self.cfg.fused_block_q_small
                import os as _os

                env_bq = _os.environ.get("RGA3_FUSED_BQ_SMALL", "")
                if env_bq:
                    # A/B override: at 64-token windows the in-block
                    # attention computes block_q/window windows' worth of
                    # masked logits — smaller blocks trade matmul M-fill
                    # for less masked-FLOP waste (bench_trunk_stages)
                    block_q = int(env_bq)
            out = fused_window_block(
                tokens, params, num_heads=self.num_heads, window=window,
                block_q=block_q, gelu_tanh=self.cfg.gelu_tanh,
            )
        out = out.reshape(b * n_win, ws, ws, d)
        return window_unpartition(out, ws, pad_hw, (h, w))


class Hiera(nn.Module):
    """Returns per-stage feature maps, highest resolution first
    (B, H/4, W/4, 144) ... (B, H/32, W/32, 1152) for Hiera-L."""

    cfg: HieraConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, num_blocks: Optional[int] = None
    ) -> List[jnp.ndarray]:
        cfg = self.cfg
        # patch embed: conv 7x7 stride 4 pad 3 (ref PatchEmbed :943-976)
        conv = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_kernel, cfg.patch_kernel),
            strides=(cfg.patch_stride, cfg.patch_stride),
            padding=[(cfg.patch_padding, cfg.patch_padding)] * 2,
            name="patch_embed_proj",
        )
        if (
            cfg.s2d_patch_embed
            and (cfg.patch_kernel, cfg.patch_stride, cfg.patch_padding)
            == (7, 4, 3)
            and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
        ):
            # declare the conv's params (dummy call, DCE'd) so the
            # checkpoint tree is identical, then run the MXU-friendly
            # space-to-depth form
            conv(jnp.zeros((1, 8, 8, x.shape[-1]), x.dtype))
            cw = self.scope.get_variable("params", "patch_embed_proj")
            x = patch_embed_s2d(
                x, cw["kernel"].astype(x.dtype), cw["bias"].astype(x.dtype)
            )
        else:
            x = conv(x)

        # windowed positional embedding (ref _get_pos_embed :1199-1208)
        h, w = x.shape[1:3]
        pos_bkg = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, *cfg.window_pos_embed_bkg_spatial_size, cfg.embed_dim),
        )
        ws0 = cfg.window_spec[0]
        pos_win = self.param(
            "pos_embed_window",
            nn.initializers.zeros,
            (1, ws0, ws0, cfg.embed_dim),
        )
        # torch-parity bicubic (a=-0.75): jax.image.resize's Keys kernel
        # (a=-0.5) would bias every token vs the reference checkpoint
        from ...ops.resize import resize_bicubic_torch

        pos = resize_bicubic_torch(
            pos_bkg.astype(jnp.float32).transpose(0, 3, 1, 2), (h, w)
        ).transpose(0, 2, 3, 1)
        tiles = (1, h // ws0, w // ws0, 1)
        pos = pos + jnp.tile(pos_win.astype(jnp.float32), tiles)
        x = x + pos.astype(x.dtype)

        stage_ends = cfg.stage_ends
        q_pool_blocks = set(cfg.q_pool_blocks)
        outputs: List[jnp.ndarray] = []
        dim = cfg.embed_dim
        heads = cfg.num_heads
        cur_stage = 1
        for i in range(cfg.depth):
            if num_blocks is not None and i >= num_blocks:
                # profiling prefix (scripts/bench_trunk_stages.py): stop
                # after `num_blocks` blocks and return what exists so far
                return outputs + [x]
            dim_out = dim
            # window size lags one block behind the stage transition
            window_size = cfg.window_spec[cur_stage - 1]
            if i in cfg.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * cfg.dim_mul)
                heads = int(heads * cfg.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                cfg,
                dim=dim,
                dim_out=dim_out,
                num_heads=heads,
                window_size=window_size,
                do_q_pool=(i in q_pool_blocks),
                name=f"blocks_{i}",
            )(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs
