"""SAM2 memory system: memory attention (self + cross with 2D axial RoPE)
and memory encoder (mask downsampler + ConvNeXt fuser)
(ref: model/sam2.py:448-769 — MemoryAttention(Layer), RoPEAttention at
:1484-1550, MaskDownSampler, CXBlock, Fuser, MemoryEncoder).

TPU redesign: the memory bank arrives as ONE static-shape tensor
(num_maskmem * feat_tokens + ptr_tokens, B, mem_dim) with a validity mask;
object-pointer tokens are excluded from RoPE via `num_k_exclude` exactly as
the reference's `num_k_exclude_rope` (ref :687-690, :1527-1533)."""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import mha_reference
from ...ops.rope import apply_rotary_interleaved, axial_cos_sin
from .config import Sam2Config
from .layers import ChannelLayerNorm, LayerNorm


class RoPEAttention(nn.Module):
    """1-head attention with axial RoPE on q and the first num_k_rope keys.

    kv_in_dim differs from embedding_dim for cross-attention to memories
    (kv 64-dim). k-validity mask support added for the static memory bank.
    """

    cfg: Sam2Config
    kv_in_dim: Optional[int] = None
    rope_k_repeat: bool = False
    num_heads: int = 1

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,  # (B, Lq, C)
        k: jnp.ndarray,  # (B, Lk, kv_in_dim)
        v: jnp.ndarray,
        num_k_exclude_rope: int = 0,
        k_valid: Optional[jnp.ndarray] = None,  # (B, Lk) bool
    ) -> jnp.ndarray:
        # Contract: every batch row must have >= 1 valid key. With ALL
        # keys invalid the two branches disagree: the dense fallback's
        # -1e30 masking degenerates to mean(V) over the real keys, while
        # the flash path's finite mask value makes every p=exp(0)=1 and
        # returns mean(V) over real AND padded keys. Callers satisfy the
        # contract by construction: track_video always keeps the
        # cond-frame memory slot valid (models/sam2/video.py ring-buffer
        # seeding).
        cfg = self.cfg
        d = cfg.d_model
        q = nn.Dense(d, name="q_proj")(q)
        k = nn.Dense(d, name="k_proj")(k)
        v = nn.Dense(d, name="v_proj")(v)
        b, lq, _ = q.shape
        lk = k.shape[1]
        h = self.num_heads
        hd = d // h
        qh = q.reshape(b, lq, h, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)

        # axial RoPE over the flattened sqrt(Lq) x sqrt(Lq) grid
        side = int(math.isqrt(lq))
        assert side * side == lq, "RoPEAttention expects square token grids"
        cos, sin = axial_cos_sin(side, side, hd, cfg.mem_attn_rope_theta)
        qh = apply_rotary_interleaved(qh, cos, sin)
        num_k_rope = lk - num_k_exclude_rope
        if num_k_rope > 0:
            k_rope = kh[:, :, :num_k_rope]
            if self.rope_k_repeat and num_k_rope != lq:
                # memory keys = R repeats of the spatial grid
                r = num_k_rope // lq
                cos_k = jnp.tile(cos, (r, 1))
                sin_k = jnp.tile(sin, (r, 1))
            else:
                cos_k, sin_k = cos, sin
            k_rope = apply_rotary_interleaved(k_rope, cos_k, sin_k)
            kh = jnp.concatenate([k_rope, kh[:, :, num_k_rope:]], axis=2)

        if jax.default_backend() == "tpu" and lk >= 1024:
            # flash kernel: no O(Lq*Lk) f32 logits in HBM (the 4096 x ~28.8k
            # cross-attention would otherwise materialize ~470 MB per
            # layer). Key validity rides the kv segment ids (q seg 1
            # matches only kv seg 1).
            # Edge case: with ZERO valid keys the two branches differ —
            # the dense branch's -1e30 masking softmaxes to uniform
            # (output = mean of V) while the flash segment-id masking
            # returns zeros. Callers must guarantee >=1 valid key;
            # track_video always does (the cond-frame memory slot is
            # valid from frame 0 onward), so the case is unreachable in
            # the video predictor.
            from ...ops.attention import flash_attention

            q_seg = jnp.ones((b, lq), jnp.int32)
            kv_seg = (
                k_valid.astype(jnp.int32)
                if k_valid is not None
                else jnp.ones((b, lk), jnp.int32)
            )
            out = flash_attention(
                qh.transpose(0, 2, 1, 3),
                kh.transpose(0, 2, 1, 3),
                vh.transpose(0, 2, 1, 3),
                segment_ids=q_seg,
                kv_segment_ids=kv_seg,
                scale=1.0 / math.sqrt(hd),
            ).reshape(b, lq, d)
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qh.astype(jnp.float32),
                kh.astype(jnp.float32),
            ) / math.sqrt(hd)
            if k_valid is not None:
                logits = jnp.where(
                    k_valid[:, None, None, :], logits, -1e30
                )
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", probs, vh.astype(jnp.float32)
            ).astype(q.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(d, name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    cfg: Sam2Config

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # (B, Lq, C) current-frame tokens
        memory: jnp.ndarray,  # (B, Lk, mem_dim)
        pos: jnp.ndarray,  # (B, Lk, mem_dim) memory pos enc
        query_pos: jnp.ndarray,  # (B, Lq, C)
        num_k_exclude_rope: int = 0,
        k_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        # self attention (pos_enc_at_attn=False)
        t2 = LayerNorm(name="norm1")(tgt)
        t2 = RoPEAttention(cfg, name="self_attn")(t2, t2, t2)
        tgt = tgt + t2
        # cross attention (pos added to keys only)
        t2 = LayerNorm(name="norm2")(tgt)
        t2 = RoPEAttention(
            cfg, kv_in_dim=cfg.mem_dim, rope_k_repeat=True,
            name="cross_attn_image",
        )(
            t2, memory + pos, memory,
            num_k_exclude_rope=num_k_exclude_rope, k_valid=k_valid,
        )
        tgt = tgt + t2
        # FFN (relu)
        t2 = LayerNorm(name="norm3")(tgt)
        t2 = nn.Dense(cfg.mem_attn_dim_feedforward, name="linear1")(t2)
        t2 = nn.relu(t2)
        t2 = nn.Dense(cfg.d_model, name="linear2")(t2)
        return tgt + t2


class MemoryAttention(nn.Module):
    cfg: Sam2Config

    @nn.compact
    def __call__(
        self,
        curr: jnp.ndarray,  # (B, Lq, C)
        curr_pos: jnp.ndarray,
        memory: jnp.ndarray,  # (B, Lk, mem_dim)
        memory_pos: jnp.ndarray,
        num_obj_ptr_tokens: int = 0,
        k_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        out = curr + 0.1 * curr_pos  # pos_enc_at_input (ref :573-574)
        for i in range(self.cfg.mem_attn_layers):
            out = MemoryAttentionLayer(self.cfg, name=f"layers_{i}")(
                out, memory, memory_pos, curr_pos,
                num_k_exclude_rope=num_obj_ptr_tokens, k_valid=k_valid,
            )
        return LayerNorm(name="norm")(out)


class MaskDownSampler(nn.Module):
    """4 conv(k3 s2 p1) + LN + GELU stages: 1024² mask -> 64² x d_model
    (ref :605-650; build args kernel 3 stride 2 padding 1 at :283-292 give
    log2(16)/log2(2)=4 layers)."""

    cfg: Sam2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, 1)
        chans = 1
        num_layers = 4
        for i in range(num_layers):
            chans = chans * 4
            x = nn.Conv(
                chans, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                name=f"encoder_{3 * i}",
            )(x)
            x = ChannelLayerNorm(name=f"encoder_{3 * i + 1}")(x)
            x = nn.gelu(x, approximate=False)
        return nn.Conv(self.cfg.d_model, (1, 1), name="encoder_12")(x)


class CXBlock(nn.Module):
    """ConvNeXt block with depthwise 7x7 + layer scale (ref :653-710)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim, name="dwconv",
        )(x)
        x = ChannelLayerNorm(name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param(
            "g_weight", nn.initializers.constant(1e-6), (self.dim,)
        )
        return inp + gamma * x


class MemoryEncoder(nn.Module):
    """pix feats + downsampled mask -> memory features (B, s, s, mem_dim)
    plus sine pos enc (ref :713-768)."""

    cfg: Sam2Config

    @nn.compact
    def __call__(
        self, pix_feat: jnp.ndarray, masks: jnp.ndarray,
        skip_mask_sigmoid: bool = False,
    ):
        from .layers import sine_position_encoding

        cfg = self.cfg
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        masks = MaskDownSampler(cfg, name="mask_downsampler")(masks)
        x = nn.Conv(cfg.d_model, (1, 1), name="pix_feat_proj")(pix_feat)
        x = x + masks
        for i in range(2):
            x = CXBlock(cfg.d_model, name=f"fuser_layers_{i}")(x)
        x = nn.Conv(cfg.mem_dim, (1, 1), name="out_proj")(x)
        h, w = x.shape[1:3]
        pos = sine_position_encoding(h, w, cfg.mem_dim).astype(x.dtype)
        return x, pos
