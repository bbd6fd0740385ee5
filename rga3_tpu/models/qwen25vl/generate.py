"""KV-cached autoregressive decoding (greedy / nucleus) as one jitted scan.

Replaces HF `.generate(max_new_tokens=…, do_sample=False)` used by the
reference for all QA paths (ref: app.py:308-317,
evaluation/videoinfer/inference_videoinfer.py:312-321). The loop is a
`lax.scan` over max_new_tokens with a `done` flag — static shapes, compiled
once per (batch, prefill-bucket, max_new_tokens).

Also provides `suppress_tokens` matching the reference's
SuppressTokenProcessor logits ban (ref: utils/utils.py:282-289, used by
ViP-Bench inference at evaluation/vipbench/inference_vipbench.py:98-100).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .language import make_kv_cache
from .model import Qwen25VL


@functools.lru_cache(maxsize=16)
def _prefill_fn(model, compute_dtype, has_vision: bool):
    """Cached jitted prefill. params are ARGUMENTS (closing over big param
    trees bakes them into the HLO as constants — pathological to compile
    and re-traced/re-compiled per call)."""

    @jax.jit
    def f(params, input_ids, position_ids, seg, cache,
          pixel_patches, vision_layout):
        return model.apply(
            params,
            input_ids=input_ids,
            position_ids=position_ids,
            segment_ids=seg,
            pixel_patches=pixel_patches if has_vision else None,
            vision_layout=vision_layout if has_vision else None,
            cache=cache,
            compute_dtype=compute_dtype,
        )

    return f


def _sample_token(
    logits: jnp.ndarray,  # (B, V)
    rng: jax.Array,
    temperature: float,
    top_p: float,
) -> jnp.ndarray:
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def greedy_generate(
    model: Qwen25VL,
    params,
    input_ids: jnp.ndarray,  # (B, L) right-padded prompt
    attention_mask: jnp.ndarray,  # (B, L)
    position_ids: jnp.ndarray,  # (3, B, L)
    rope_deltas: jnp.ndarray,  # (B,)
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    pixel_patches: Optional[jnp.ndarray] = None,
    vision_layout: Optional[Dict[str, Any]] = None,
    suppress_ids: Sequence[int] = (),
    temperature: float = 0.0,
    top_p: float = 1.0,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Returns (B, max_new_tokens) generated ids (pad after EOS)."""
    b, l = input_ids.shape
    cache = make_kv_cache(
        model.cfg.text, b, l + max_new_tokens, dtype=compute_dtype
    )
    seg = attention_mask.astype(jnp.int32)

    out = _prefill_fn(model, compute_dtype, pixel_patches is not None)(
        params, input_ids, position_ids, seg, cache,
        pixel_patches, vision_layout,
    )
    cache = out["cache"]

    # last valid logit per sample (right padding)
    last_idx = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
    logits = jnp.take_along_axis(
        out["logits"], last_idx[:, None, None], axis=1
    )[:, 0]

    if rng is None:
        rng = jax.random.PRNGKey(0)

    sup = jnp.asarray(list(suppress_ids), jnp.int32) if suppress_ids else None

    def mask_logits(lg):
        if sup is not None:
            lg = lg.at[:, sup].set(-jnp.inf)
        return lg

    # decode positions: seq_len + rope_delta + step (all 3 streams equal)
    next_pos = (
        jnp.sum(attention_mask, axis=1).astype(jnp.int32)
        + rope_deltas.astype(jnp.int32)
    )  # (B,)

    first_tok = _sample_token(
        mask_logits(logits.astype(jnp.float32)), rng, temperature, top_p
    )

    decode = _decode_fn(
        model, compute_dtype, max_new_tokens,
        int(eos_token_id), int(pad_token_id),
        tuple(int(i) for i in suppress_ids),
        float(temperature), float(top_p),
    )
    return decode(params, cache, first_tok, rng, next_pos)


@functools.lru_cache(maxsize=16)
def _decode_fn(model, compute_dtype, max_new_tokens, eos_token_id,
               pad_token_id, suppress_ids, temperature, top_p):
    """Cached jitted decode scan — params as arguments, never captured."""
    sup = (
        jnp.asarray(list(suppress_ids), jnp.int32) if suppress_ids else None
    )

    @jax.jit
    def decode(params, cache, first_tok, rng, next_pos):
        b = first_tok.shape[0]

        def step(carry, i):
            cache, tok, done, rng = carry
            rng, sub = jax.random.split(rng)
            pos = jnp.broadcast_to(
                (next_pos + i)[None, :, None], (3, b, 1)
            ).astype(jnp.int32)
            out = model.apply(
                params,
                input_ids=tok[:, None],
                position_ids=pos,
                cache=cache,
                compute_dtype=compute_dtype,
            )
            lg = out["logits"][:, -1].astype(jnp.float32)
            if sup is not None:
                lg = lg.at[:, sup].set(-jnp.inf)
            nxt = _sample_token(lg, sub, temperature, top_p)
            nxt = jnp.where(done, pad_token_id, nxt)
            emitted = jnp.where(done, pad_token_id, tok)
            done = done | (tok == eos_token_id)
            return (out["cache"], nxt, done, rng), emitted

        done0 = jnp.zeros((b,), bool)
        # step i feeds the i-th generated token, whose sequence index is
        # prompt_len + i, so its M-RoPE position is next_pos + i (next_pos
        # is already last_prompt_pos + 1 = prompt_len + rope_delta).
        (_, _, _, _), toks = jax.lax.scan(
            step,
            (cache, first_tok, done0, rng),
            jnp.arange(max_new_tokens),
        )
        return jnp.moveaxis(toks, 0, 1)  # (B, max_new_tokens)

    return decode
