"""Qwen2.5 decoder language model in flax.linen (JAX rebuild of the
HF Qwen2.5-VL text stack the reference depends on — SURVEY.md §2.3).

TPU-first notes:
  * Attention runs through `ops.attention.flash_attention` (Pallas on TPU).
  * KV cache is a static-shape pytree; decode steps update it with
    `lax.dynamic_update_slice` so the whole generate loop jits.
  * M-RoPE tables are computed once per forward from (3, B, L) position ids
    (ops.rope.mrope_cos_sin).
  * Weights carry flax logical-partitioning names so pjit shards them via
    rules in rga3_tpu.parallel.sharding ("embed", "mlp", "heads", "vocab").
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import partitioning as nn_partitioning

from ...ops import rope as rope_ops
from ...ops.attention import flash_attention, mha_reference
from .config import QwenTextConfig

param_with_axes = nn_partitioning.param_with_axes


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "weight", nn.initializers.ones, (x.shape[-1],), jnp.float32
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(x.dtype)


# per-layer cache planes threaded through the decoder (scan + unrolled);
# the scale planes exist only for int8 caches
_CACHE_PLANES = ("k", "v", "k_scale", "v_scale")


def _quantize_kv_i8(t: jnp.ndarray):
    """(B, L, Hkv, hd) -> (int8 values, f32 per-vector scale over hd).

    Symmetric absmax/127 per (batch, position, kv-head) vector — the
    head-dim direction is what the attention dot contracts, so one scale
    per vector keeps the dequant a rank-broadcast multiply."""
    tf = t.astype(jnp.float32)
    s = jnp.max(jnp.abs(tf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.round(tf / s).astype(jnp.int8)
    return q, s[..., 0]


def make_kv_cache(
    cfg: QwenTextConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Static-shape KV cache pytree for all layers.

    With cfg.kv_cache_int8 the K/V planes are int8 plus per-(position,
    kv-head) f32 scales (1/128 the elements) — half the decode-time HBM
    stream of a bf16 cache."""
    shape = (cfg.num_hidden_layers, batch, max_len,
             cfg.num_key_value_heads, cfg.head_dim)
    if cfg.kv_cache_int8:
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
            "idx": jnp.zeros((), jnp.int32),
            "seg": jnp.zeros((batch, max_len), jnp.int32),
            "fresh": jnp.zeros((), jnp.int32),
        }
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "idx": jnp.zeros((), jnp.int32),  # filled length (uniform per batch)
        # per-row key validity: right-padded prefills leave pad K/V in the
        # cache between a short row's last token and the decode appends;
        # decode attention masks them via this plane
        "seg": jnp.zeros((batch, max_len), jnp.int32),
        # structural marker (the KEY, not the value, carries the bit —
        # pytree structure is static under jit): this cache is empty, so
        # a multi-token call may take the flash prefill fast path.
        # Forward passes drop the key from the cache they return, which
        # routes chunked prefills into the general masked path.
        "fresh": jnp.zeros((), jnp.int32),
    }


class QuantDense(nn.Module):
    """Weight-only quantized Dense (ops.quant layout). bits=8: int8
    kernel + per-output-channel scale. bits=4: nibble-packed int4 kernel
    + group-wise scales. Either way the kernel is dequantized in-register
    at matmul time; HBM weight traffic drops 2x / 4x vs bf16 (what bounds
    KV-cached decode)."""

    features: int
    use_bias: bool = False
    kernel_axes: Tuple[str, ...] = ()
    bits: int = 8
    # token-axis length at/above which bits==8 uses the W8A8 int8-MXU
    # dot (2x bf16 FLOP rate on v5e) instead of the weight-only bf16
    # dot. 0 disables. Decode steps (L=1) always stay weight-only.
    w8a8_min_seq: int = 0

    @nn.compact
    def __call__(self, x):
        from ...ops.quant import (
            int4_group, int4_matmul, int8_matmul, int8_w8a8_matmul,
        )

        if self.kernel_axes:
            k_init = nn.with_logical_partitioning(
                nn.initializers.zeros, self.kernel_axes
            )
            s_init = nn.with_logical_partitioning(
                nn.initializers.ones, self.kernel_axes[-1:]
            )
            sg_init = nn.with_logical_partitioning(
                nn.initializers.ones, (None, self.kernel_axes[-1])
            )
        else:  # vision tower layers carry no logical axes
            k_init = nn.initializers.zeros
            s_init = nn.initializers.ones
            sg_init = nn.initializers.ones
        in_dim = x.shape[-1]
        if self.bits == 4:
            wq = self.param(
                "kernel_q4", k_init, (in_dim // 2, self.features), jnp.int8
            )
            scale = self.param(
                "scale_g", sg_init,
                (in_dim // int4_group(in_dim), self.features), jnp.float32,
            )
            y = int4_matmul(x, wq, scale)
        else:
            wq = self.param(
                "kernel_q", k_init, (in_dim, self.features), jnp.int8
            )
            scale = self.param(
                "scale", s_init, (self.features,), jnp.float32
            )
            if (
                self.w8a8_min_seq
                and x.ndim >= 2
                and x.shape[-2] >= self.w8a8_min_seq
            ):
                y = int8_w8a8_matmul(x, wq, scale)
            else:
                y = int8_matmul(x, wq, scale)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(x.dtype)
        return y


def _dense_or_quant(cfg, name, features, use_bias, kernel_axes, dtype):
    int4 = getattr(cfg, "quant_int4", False)
    if cfg.quant_int8 or int4:
        assert not (cfg.quant_int8 and int4), (
            "quant_int8 and quant_int4 are mutually exclusive"
        )
        return QuantDense(
            features, use_bias=use_bias, kernel_axes=kernel_axes, name=name,
            bits=4 if int4 else 8,
            w8a8_min_seq=32 if getattr(cfg, "quant_w8a8", False) else 0,
        )
    return nn.Dense(
        features,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), kernel_axes
        ),
    )


class Attention(nn.Module):
    cfg: QwenTextConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, L, D)
        cos: jnp.ndarray,  # (B, L, head_dim)
        sin: jnp.ndarray,
        segment_ids: Optional[jnp.ndarray],
        layer_cache: Optional[Dict[str, jnp.ndarray]] = None,
        cache_idx: Optional[jnp.ndarray] = None,
        cache_seg: Optional[jnp.ndarray] = None,  # (B, max_len) 0 = pad
        fresh_cache: bool = False,  # static: cache known empty (idx == 0)
    ):
        cfg = self.cfg
        b, l, _ = x.shape
        h, hkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        )

        def dense(name, features, use_bias, kernel_axes):
            return _dense_or_quant(
                cfg, name, features, use_bias, kernel_axes, x.dtype
            )

        def lora(name, features, base):
            """LoRA adapter: base + (alpha/r) * x @ A @ B (A ~ N(0, 1/r),
            B zeros — the PEFT init the reference trains with)."""
            if cfg.lora_rank <= 0:
                return base
            a = self.param(
                f"{name}_lora_a",
                nn.initializers.normal(1.0 / cfg.lora_rank),
                (x.shape[-1], cfg.lora_rank),
                jnp.float32,
            )
            bmat = self.param(
                f"{name}_lora_b",
                nn.initializers.zeros,
                (cfg.lora_rank, features),
                jnp.float32,
            )
            scale = cfg.lora_alpha / cfg.lora_rank
            delta = (
                x.astype(jnp.float32) @ a @ bmat * scale
            ).astype(base.dtype)
            return base + delta

        q = lora("q_proj", h * hd, dense("q_proj", h * hd, True, ("embed", "heads"))(x))
        k = dense("k_proj", hkv * hd, True, ("embed", "heads"))(x)
        v = lora("v_proj", hkv * hd, dense("v_proj", hkv * hd, True, ("embed", "heads"))(x))
        q = q.reshape(b, l, h, hd)
        k = k.reshape(b, l, hkv, hd)
        v = v.reshape(b, l, hkv, hd)

        q = rope_ops.apply_rope(q, cos, sin)
        k = rope_ops.apply_rope(k, cos, sin)

        if layer_cache is None:
            out = flash_attention(
                q, k, v, causal=True, segment_ids=segment_ids
            )
            new_cache = {"k": k, "v": v}
        else:
            # decode: append k/v at cache_idx, attend over filled prefix
            quant = "k_scale" in layer_cache
            ck, cv = layer_cache["k"], layer_cache["v"]
            if quant:
                kq, ks = _quantize_kv_i8(k)
                vq, vs = _quantize_kv_i8(v)
                ck = jax.lax.dynamic_update_slice(
                    ck, kq, (0, cache_idx, 0, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, vq, (0, cache_idx, 0, 0)
                )
                cks = jax.lax.dynamic_update_slice(
                    layer_cache["k_scale"], ks, (0, cache_idx, 0)
                )
                cvs = jax.lax.dynamic_update_slice(
                    layer_cache["v_scale"], vs, (0, cache_idx, 0)
                )
                new_cache = {
                    "k": ck, "v": cv, "k_scale": cks, "v_scale": cvs,
                }
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, k.astype(ck.dtype), (0, cache_idx, 0, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, v.astype(cv.dtype), (0, cache_idx, 0, 0)
                )
                new_cache = {"k": ck, "v": cv}
            if l > 1 and fresh_cache:
                # Prefill into a cache statically known to be empty (the
                # "fresh" marker make_kv_cache plants and forward passes
                # strip): the filled prefix IS the appended block, so
                # attention reduces to causal flash over (q, k, v) — no
                # (B, H, L, max_len) fp32 logits materialization. A
                # chunked prefill (cache_idx > 0) has no marker and takes
                # the general masked path below.
                out = flash_attention(
                    q, k, v, causal=True, segment_ids=segment_ids
                )
                out = out.reshape(b, l, h * hd)
                return (
                    dense("o_proj", cfg.hidden_size, False,
                          ("heads", "embed"))(out),
                    new_cache,
                )
            max_len = ck.shape[1]
            if quant:
                # dequant fuses into the dot's operand read (int8 load +
                # cast + broadcast-mul), so the HBM stream stays int8
                ckf = ck.astype(jnp.float32) * cks[..., None]
                cvf = cv.astype(jnp.float32) * cvs[..., None]
            else:
                ckf = ck.astype(jnp.float32)
                cvf = cv.astype(jnp.float32)
            # GQA-native: contract each kv head against its g query
            # heads directly — a jnp.repeat here materializes a
            # (h/hkv)x-expanded f32 K/V every decode step (~3 GB/step at
            # the 7B serving batch), several times the cache's own HBM
            # stream. HF head order: q head i uses kv head i // g.
            g = h // hkv
            q5 = q.reshape(b, l, hkv, g, hd).astype(jnp.float32)
            logits = jnp.einsum(
                "bqkgd,bmkd->bkgqm", q5, ckf
            ) * (hd**-0.5)
            kpos = jnp.arange(max_len)[None, None, None, None, :]
            qpos = (
                cache_idx + jnp.arange(l)
            )[None, None, None, :, None]
            valid = kpos <= qpos  # causal within the appended block too
            if cache_seg is not None:
                # mask pad K/V left in the cache by right-padded prefills
                valid = valid & (
                    cache_seg[:, None, None, None, :] > 0
                )
            logits = jnp.where(valid, logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bkgqm,bmkd->bqkgd", probs, cvf
            ).reshape(b, l, h, hd).astype(x.dtype)

        out = out.reshape(b, l, h * hd)
        out = dense("o_proj", cfg.hidden_size, False, ("heads", "embed"))(out)
        return out, new_cache


class MLP(nn.Module):
    cfg: QwenTextConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg

        def dense(name, features, kernel_axes):
            return _dense_or_quant(
                cfg, name, features, False, kernel_axes, x.dtype
            )

        gate = dense("gate_proj", cfg.intermediate_size, ("embed", "mlp"))(x)
        up = dense("up_proj", cfg.intermediate_size, ("embed", "mlp"))(x)
        return dense("down_proj", cfg.hidden_size, ("mlp", "embed"))(
            nn.silu(gate) * up
        )


class DecoderLayer(nn.Module):
    cfg: QwenTextConfig

    @nn.compact
    def __call__(self, x, cos, sin, segment_ids, layer_cache, cache_idx,
                 cache_seg=None, fresh_cache=False):
        attn_out, new_cache = Attention(self.cfg, name="self_attn")(
            RMSNorm(self.cfg.rms_norm_eps, name="input_layernorm")(x),
            cos, sin, segment_ids, layer_cache, cache_idx, cache_seg,
            fresh_cache,
        )
        x = x + attn_out
        x = x + MLP(self.cfg, name="mlp")(
            RMSNorm(self.cfg.rms_norm_eps, name="post_attention_layernorm")(x)
        )
        return x, new_cache


def _remat_wrap(layer_cls, mode):
    """Rematerialization wrapper for a decoder layer.

    mode False/"none": store all activations (fastest backward, most HBM).
    mode True/"full": recompute the whole layer in the backward pass
    (the torch gradient-checkpointing equivalent, ref train_joint.py's
    gradient_checkpointing; ~4/3 the fwd FLOPs per step).
    mode "dots": jax.checkpoint with dots_with_no_batch_dims_saveable —
    weight-matmul outputs are SAVED, only norms/rope/elementwise are
    recomputed, so the backward keeps fused-kernel speed while activation
    memory stays ~6 tensors per layer instead of every intermediate."""
    if mode in (False, None, "none"):
        return layer_cls
    kw = dict(static_argnums=(), prevent_cse=False)
    if mode == "dots":
        kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return nn.remat(layer_cls, **kw)


class QwenLM(nn.Module):
    """Decoder stack. Takes input embeddings (vision tokens already merged
    in by the caller — model.py) and 3-stream M-RoPE position ids."""

    cfg: QwenTextConfig
    remat: Any = False  # False | True | "full" | "dots" | "none"

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jnp.ndarray,  # (B, L, D)
        position_ids: jnp.ndarray,  # (3, B, L)
        segment_ids: Optional[jnp.ndarray] = None,  # (B, L); 0 = pad
        cache: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jnp.ndarray, Optional[Dict[str, Any]]]:
        cfg = self.cfg
        cos, sin = rope_ops.mrope_cos_sin(
            position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section
        )
        x = inputs_embeds
        cache_idx = None if cache is None else cache["idx"]
        # static bit: the cache pytree still carries make_kv_cache's
        # "fresh" marker (never copied into returned caches)
        fresh_cache = cache is not None and "fresh" in cache

        # maintain the per-row key-validity plane alongside the K/V cache
        # (pads from right-padded prefills must stay masked during decode)
        cache_seg = None
        if cache is not None and "seg" in cache:
            b_, l_ = x.shape[:2]
            seg_now = (
                segment_ids.astype(jnp.int32)
                if segment_ids is not None
                else jnp.ones((b_, l_), jnp.int32)
            )
            cache_seg = jax.lax.dynamic_update_slice(
                cache["seg"], seg_now, (0, cache_idx)
            )

        if cfg.scan_layers:
            x, new_cache = self._scan_layers(
                x, cos, sin, segment_ids, cache, cache_idx, cache_seg,
                fresh_cache,
            )
        else:
            per_layer = []
            layer_cls = DecoderLayer
            if self.remat and cache is None:
                layer_cls = _remat_wrap(DecoderLayer, self.remat)
            for i in range(cfg.num_hidden_layers):
                layer_cache = None
                if cache is not None:
                    layer_cache = {
                        key: cache[key][i] for key in _CACHE_PLANES
                        if key in cache
                    }
                x, updated = layer_cls(cfg, name=f"layers_{i}")(
                    x, cos, sin, segment_ids, layer_cache, cache_idx,
                    cache_seg, fresh_cache,
                )
                if cache is not None:
                    per_layer.append(updated)
            new_cache = None
            if cache is not None:
                new_cache = {
                    key: jnp.stack([u[key] for u in per_layer])
                    for key in per_layer[0]
                }

        x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)

        if new_cache is not None:
            new_cache["idx"] = cache["idx"] + inputs_embeds.shape[1]
            if cache_seg is not None:
                new_cache["seg"] = cache_seg
        return x, new_cache

    def _scan_layers(self, x, cos, sin, segment_ids, cache, cache_idx,
                     cache_seg=None, fresh_cache=False):
        cfg = self.cfg

        class ScannedLayer(nn.Module):
            cfg_: QwenTextConfig
            remat_: Any

            @nn.compact
            def __call__(self, carry, layer_cache):
                layer = DecoderLayer
                if self.remat_ and layer_cache is None:
                    layer = _remat_wrap(DecoderLayer, self.remat_)
                out, updated = layer(self.cfg_, name="layer")(
                    carry, cos, sin, segment_ids, layer_cache, cache_idx,
                    cache_seg, fresh_cache,
                )
                if layer_cache is None:
                    return out, None
                return out, updated

        scan = nn.scan(
            ScannedLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=cfg.num_hidden_layers,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )
        layer_caches = (
            None if cache is None
            else {
                key: cache[key] for key in _CACHE_PLANES if key in cache
            }
        )
        x, stacked = scan(cfg, self.remat, name="layers_scan")(
            x, layer_caches
        )
        new_cache = None
        if cache is not None:
            new_cache = dict(stacked)
        return x, new_cache


class QwenForCausalLM(nn.Module):
    """Embedding + decoder + lm_head (tied option for 3B)."""

    cfg: QwenTextConfig
    remat: Any = False  # False | True | "full" | "dots" | "none"

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.cfg.vocab_size,
            self.cfg.hidden_size,
            param_dtype=jnp.float32,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
            name="embed_tokens",
        )
        self.model = QwenLM(self.cfg, remat=self.remat, name="model")
        if not self.cfg.tie_word_embeddings:
            if self.cfg.quant_int8 or self.cfg.quant_int4:
                self.lm_head = QuantDense(
                    self.cfg.vocab_size,
                    kernel_axes=("embed", "vocab"),
                    name="lm_head",
                    bits=4 if self.cfg.quant_int4 else 8,
                )
            else:
                self.lm_head = nn.Dense(
                    self.cfg.vocab_size,
                    use_bias=False,
                    param_dtype=jnp.float32,
                    kernel_init=nn.with_logical_partitioning(
                        nn.initializers.lecun_normal(), ("embed", "vocab")
                    ),
                    name="lm_head",
                )

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(input_ids)

    def head(self, hidden: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(hidden)
        return self.lm_head(hidden)

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        cache: Optional[Dict[str, Any]] = None,
        compute_dtype: Any = jnp.float32,
        logits_indices: Optional[jnp.ndarray] = None,  # (B,) positions
    ):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        inputs_embeds = inputs_embeds.astype(compute_dtype)
        if position_ids is None:
            b, l = inputs_embeds.shape[:2]
            base = jnp.arange(l)[None, :].repeat(b, 0)
            if cache is not None:
                base = base + cache["idx"]
            position_ids = jnp.broadcast_to(base, (3, b, l))
        hidden, new_cache = self.model(
            inputs_embeds, position_ids, segment_ids, cache
        )
        if logits_indices is not None:
            # generate-style callers consume ONE position per row: skip
            # the (B, L, vocab) head matmul + HBM writes (~8% of a 512-
            # token prefill) and emit (B, 1, vocab)
            sel = jnp.take_along_axis(
                hidden, logits_indices[:, None, None], axis=1
            )
            logits = self.head(sel)
        else:
            logits = self.head(hidden)
        return {
            "logits": logits,
            "hidden_states": hidden,
            "cache": new_cache,
        }
