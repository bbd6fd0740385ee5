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
          pixel_patches, vision_layout, last_idx):
        return model.apply(
            params,
            input_ids=input_ids,
            position_ids=position_ids,
            segment_ids=seg,
            pixel_patches=pixel_patches if has_vision else None,
            vision_layout=vision_layout if has_vision else None,
            cache=cache,
            compute_dtype=compute_dtype,
            logits_indices=last_idx,  # head on ONE position per row
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

    # last valid position per sample (right padding) — the only logits
    # the head computes
    last_idx = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
    out = _prefill_fn(model, compute_dtype, pixel_patches is not None)(
        params, input_ids, position_ids, seg, cache,
        pixel_patches, vision_layout, last_idx,
    )
    cache = out["cache"]
    logits = out["logits"][:, 0]

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


def speculative_greedy_generate(
    model: Qwen25VL,
    params,
    draft_model: Qwen25VL,
    draft_params,
    input_ids: jnp.ndarray,  # (1, L) prompt (batch 1: per-row accept
    # counts would diverge the uniform cache idx)
    attention_mask: jnp.ndarray,  # (1, L)
    position_ids: jnp.ndarray,  # (3, 1, L)
    rope_deltas: jnp.ndarray,  # (1,)
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    k: int = 4,
    pixel_patches: Optional[jnp.ndarray] = None,
    vision_layout: Optional[Dict[str, Any]] = None,
    draft_pixel_patches: Optional[jnp.ndarray] = None,
    draft_vision_layout: Optional[Dict[str, Any]] = None,
    suppress_ids: Sequence[int] = (),
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict[str, int]]:
    """Draft-and-verify greedy decoding — token-exact vs greedy_generate.

    A cheap draft model proposes k tokens autoregressively; the target
    verifies all of them in ONE (k+1)-token forward (a chunked decode —
    the cache's position-based masking keeps stale K/V beyond the
    accepted prefix invisible, so 'rollback' is just rewinding the idx
    scalar). Greedy acceptance (d_i == target argmax) makes the output
    bit-identical to plain greedy decode for ANY draft; the draft only
    controls speed. The draft runs k+1 forwards (its cache then always
    covers the accepted prefix, even on full acceptance). Decode is
    weight-HBM-bound, so the target's cost per iteration is ~one decode
    step while emitting up to k+1 tokens.

    The whole loop runs ON DEVICE (`lax.while_loop` in one jitted call) —
    no host round-trip per verify step. Returns ((1, max_new_tokens) ids
    padded after EOS, {"steps", "emitted"}).

    TPU-native speedup beyond the reference's HF `.generate` greedy loop
    (ref inference_videoinfer.py:312-321 — no speculative path exists
    there)."""
    b, l = input_ids.shape
    assert b == 1, "speculative decode is a latency path: batch 1"

    seg = attention_mask.astype(jnp.int32)
    tcache = make_kv_cache(
        model.cfg.text, b, l + max_new_tokens + k + 2, dtype=compute_dtype
    )
    dcache = make_kv_cache(
        draft_model.cfg.text, b, l + max_new_tokens + k + 2,
        dtype=compute_dtype,
    )

    last_idx = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
    out = _prefill_fn(model, compute_dtype, pixel_patches is not None)(
        params, input_ids, position_ids, seg, tcache,
        pixel_patches, vision_layout, last_idx,
    )
    tcache = out["cache"]
    dout = _prefill_fn(
        draft_model, compute_dtype, draft_pixel_patches is not None
    )(
        draft_params, input_ids, position_ids, seg, dcache,
        draft_pixel_patches, draft_vision_layout, last_idx,
    )
    dcache = dout["cache"]

    logits = out["logits"][:, 0].astype(jnp.float32)
    sup = jnp.asarray(list(suppress_ids), jnp.int32) if suppress_ids else None
    if sup is not None:
        logits = logits.at[:, sup].set(-jnp.inf)
    cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (1,)

    next_pos = (
        jnp.sum(attention_mask, axis=1).astype(jnp.int32)
        + rope_deltas.astype(jnp.int32)
    )  # (1,) M-RoPE position of the first generated token

    if max_new_tokens == 0:
        return jnp.zeros((1, 0), jnp.int32), {"steps": 0, "emitted": 0}

    run = _spec_loop_fn(
        model, draft_model, compute_dtype, int(k), int(max_new_tokens),
        int(eos_token_id), int(pad_token_id),
        tuple(int(i) for i in suppress_ids),
    )
    toks, steps, n = run(params, draft_params, tcache, dcache, cur,
                         next_pos)
    return toks, {"steps": int(steps), "emitted": int(n)}


@functools.lru_cache(maxsize=8)
def _spec_loop_fn(model, draft_model, compute_dtype, k, max_new_tokens,
                  eos_token_id, pad_token_id, suppress_ids):
    """The whole speculative loop as one jitted lax.while_loop: per
    iteration, k+1 draft forwards + one (k+1)-token target verify +
    cache-idx rewind to the accepted prefix. `next_pos` is the M-RoPE
    position of the first generated token."""
    sup = (
        jnp.asarray(list(suppress_ids), jnp.int32) if suppress_ids else None
    )

    def mask(lg):
        lg = lg.astype(jnp.float32)
        if sup is not None:
            lg = lg.at[:, sup].set(-jnp.inf)
        return lg

    @jax.jit
    def run(params, draft_params, tcache, dcache, cur, next_pos):
        b = cur.shape[0]
        # buffer padded by k+1: an iteration near the budget may write a
        # full window past max_new_tokens; truncated on return
        buf = jnp.full((max_new_tokens + k + 1,), pad_token_id, jnp.int32)
        buf = buf.at[0].set(cur[0])
        # greedy_generate emits the first token even when it is EOS
        done0 = cur[0] == eos_token_id
        state0 = (tcache, dcache, cur, buf,
                  jnp.asarray(1, jnp.int32),  # n emitted
                  jnp.asarray(0, jnp.int32),  # verify steps
                  done0)

        def cond(state):
            _, _, _, _, n, _, done = state
            return (n < max_new_tokens) & (~done)

        def body(state):
            tcache, dcache, cur, buf, n, steps, done = state
            cur_pos = next_pos + n - 1  # cur's own M-RoPE position
            t_idx0 = tcache["idx"]
            d_idx0 = dcache["idx"]

            # --- draft k proposals (k+1 forwards so the draft cache
            # covers the accepted prefix even on full acceptance) ---
            def dstep(carry, i):
                dcache, tok = carry
                pos = jnp.broadcast_to(
                    (cur_pos + i)[None, :, None], (3, b, 1)
                ).astype(jnp.int32)
                dout = draft_model.apply(
                    draft_params, input_ids=tok[:, None],
                    position_ids=pos, cache=dcache,
                    compute_dtype=compute_dtype,
                )
                nxt = jnp.argmax(
                    mask(dout["logits"][:, -1]), axis=-1
                ).astype(jnp.int32)
                return (dout["cache"], nxt), nxt

            (dcache, _), drafts = jax.lax.scan(
                dstep, (dcache, cur), jnp.arange(k + 1)
            )
            drafts = drafts[:k]  # (k, b) proposals d_1..d_k

            # --- one (k+1)-token target verify over [cur, d_1..d_k] ---
            win_ids = jnp.concatenate([cur[None], drafts], axis=0).T
            pos = (cur_pos[None, :, None]
                   + jnp.arange(k + 1)[None, None, :]).astype(jnp.int32)
            pos = jnp.broadcast_to(pos, (3, b, k + 1))
            tout = model.apply(
                params, input_ids=win_ids, position_ids=pos,
                cache=tcache, compute_dtype=compute_dtype,
            )
            tcache = tout["cache"]
            greedy = jnp.argmax(
                mask(tout["logits"].reshape(b * (k + 1), -1)).reshape(
                    b, k + 1, -1
                ),
                axis=-1,
            ).astype(jnp.int32)  # (b, k+1): g_0..g_k

            # accept d_i while it matches g_{i-1}, no EOS emitted earlier
            match = drafts.T == greedy[:, :k]
            not_eos = jnp.cumprod(
                (greedy[:, :k] != eos_token_id).astype(jnp.int32), axis=1
            ).astype(bool)
            acc = jnp.cumprod(match & not_eos, axis=1)  # (b, k)
            a = jnp.sum(acc, axis=1)  # accepted count in [0, k]
            n_emit = a[0] + 1  # emitted: g_0..g_a (correction / bonus)

            # write the emitted prefix into the output buffer, cutting
            # at the first EOS (inclusive)
            win = greedy[0]  # (k+1,)
            idxs = jnp.arange(k + 1)
            is_eos = (win == eos_token_id) & (idxs < n_emit)
            any_eos = jnp.any(is_eos)
            first_eos = jnp.argmax(is_eos)
            n_eff = jnp.where(any_eos, first_eos + 1, n_emit)
            old = jax.lax.dynamic_slice(buf, (n,), (k + 1,))
            buf = jax.lax.dynamic_update_slice(
                buf, jnp.where(idxs < n_eff, win, old), (n,)
            )

            tcache = dict(tcache)
            tcache["idx"] = t_idx0 + n_emit
            dcache = dict(dcache)
            dcache["idx"] = d_idx0 + n_emit
            cur = jnp.take_along_axis(greedy, a[:, None], axis=1)[:, 0]
            return (tcache, dcache, cur, buf, n + n_eff, steps + 1,
                    done | any_eos)

        _, _, _, buf, n, steps, _ = jax.lax.while_loop(cond, body, state0)
        n = jnp.minimum(n, max_new_tokens)
        return buf[:max_new_tokens][None, :], steps, n

    return run


@functools.lru_cache(maxsize=16)
def _decode_fn(model, compute_dtype, max_new_tokens, eos_token_id,
               pad_token_id, suppress_ids, temperature, top_p):
    """Cached jitted decode loop — params as arguments, never captured.

    lax.while_loop with an all-rows-done early exit: real answers are
    usually much shorter than max_new_tokens (VideoRefer emits one
    letter against a 128-token budget), and the reference's HF
    `.generate` also stops at EOS — a fixed-length scan would pay the
    full budget every call."""
    sup = (
        jnp.asarray(list(suppress_ids), jnp.int32) if suppress_ids else None
    )

    @jax.jit
    def decode(params, cache, first_tok, rng, next_pos):
        b = first_tok.shape[0]
        buf0 = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)

        def cond(c):
            _, _, done, _, _, i = c
            return (i < max_new_tokens) & ~jnp.all(done)

        # iteration i feeds the i-th generated token, whose sequence index
        # is prompt_len + i, so its M-RoPE position is next_pos + i
        # (next_pos is already last_prompt_pos + 1 = prompt_len +
        # rope_delta).
        def body(c):
            cache, tok, done, rng, buf, i = c
            emitted = jnp.where(done, pad_token_id, tok)
            buf = jax.lax.dynamic_update_slice(
                buf, emitted[:, None].astype(jnp.int32), (0, i)
            )
            done = done | (tok == eos_token_id)
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
            return (out["cache"], nxt, done, rng, buf, i + 1)

        state = (
            cache, first_tok.astype(jnp.int32), jnp.zeros((b,), bool),
            rng, buf0, jnp.asarray(0, jnp.int32),
        )
        *_, buf, _ = jax.lax.while_loop(cond, body, state)
        return buf

    return decode
