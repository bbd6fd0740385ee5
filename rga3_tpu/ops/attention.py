"""Attention kernels: Pallas TPU flash attention with a pure-XLA fallback.

Replaces the reference's flash-attn 2.7.4 CUDA dependency
(`attn_implementation="flash_attention_2"`, ref: train_joint.py:181,
app.py:54) with a TPU-native implementation:

  * `flash_attention` — Pallas online-softmax kernel, causal or full, with
    optional segment ids (packed batches / Qwen ViT window attention where
    each window is a segment). GQA-aware: kv heads are indexed through the
    BlockSpec index map, never materialized per-query-head. Runs on TPU; on
    CPU (tests) it falls back to the XLA reference path automatically.
  * `mha_reference` — straightforward XLA attention used for correctness
    tests and as the CPU fallback. fp32 softmax accumulation in both paths.

Layout: (B, L, H, D) for q/k/v ("BLHD").
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """XLA attention. q: (B, Lq, H, D); k/v: (B, Lk, Hkv, D)."""
    b, lq, h, d = q.shape
    _, lk, hkv, _ = k.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((lq, lk), bool), k=lk - lq)[None, None]
    if segment_ids is not None:
        kv_seg = kv_segment_ids if kv_segment_ids is not None else segment_ids
        seg = segment_ids[:, None, :, None] == kv_seg[:, None, None, :]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_seg_ref,
    kv_seg_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
):
    qi = pl.program_id(2)  # query-block index
    ki = pl.program_id(3)  # kv-block index

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    def compute():
        q = q_ref[0, 0].astype(jnp.float32)  # (block_q, d)
        k = k_ref[0, 0].astype(jnp.float32)  # (block_k, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (block_q, block_k)

        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        q_seg = q_seg_ref[0, 0].reshape(block_q, 1)
        k_seg = kv_seg_ref[0, 0].reshape(1, block_k)
        mask = q_seg == k_seg
        if causal:
            mask = mask & (q_pos >= k_pos)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:]  # (block_q, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_scratch[:] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        )
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    # Segment-range block skipping: segment ids are typically contiguous
    # runs (ViT windows in window order, packed sequences, validity
    # prefixes), so a kv block whose id range doesn't intersect the q
    # block's range is fully masked — skip its matmuls. min/max ranges
    # make this conservative: arbitrary (non-contiguous) layouts simply
    # skip less, never incorrectly (profiled: the Qwen ViT's 64-token
    # windows made flash ~36% of the vision tower at 16% efficiency).
    q_seg_blk = q_seg_ref[0, 0]
    k_seg_blk = kv_seg_ref[0, 0]
    visit = (jnp.max(q_seg_blk) >= jnp.min(k_seg_blk)) & (
        jnp.min(q_seg_blk) <= jnp.max(k_seg_blk)
    )
    if causal:
        # also skip fully-masked kv blocks above the diagonal
        visit = visit & (ki * block_k <= qi * block_q + block_q - 1)

    @pl.when(visit)
    def _():
        compute()

    @pl.when(ki == pl.num_programs(3) - 1)
    def _finalize():
        l = l_scratch[:]
        # guards only the zero-keys-visited edge (causal block skipping);
        # a row whose keys are all MASKED still has l>0 (p=exp(0)=1 per
        # key) and yields mean(V) — see RoPEAttention's >=1-valid-key
        # contract in models/sam2/memory.py
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "scale", "block_q", "block_k", "interpret", "num_q_heads"
    ),
)
def _flash_call(
    q, k, v, q_seg, kv_seg, *,
    causal, scale, block_q, block_k, interpret, num_q_heads,
):
    """q: (B, H, Lq, D); k/v: (B, Hkv, Lk, D); segs: (B, L)."""
    b, h, lq, d = q.shape
    hkv = k.shape[1]
    lk = k.shape[2]
    rep = num_q_heads // hkv
    grid = (b, h, pl.cdiv(lq, block_q), pl.cdiv(lk, block_k))

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # segment ids carried as (B, 1, L): Mosaic requires the last two
            # block dims be (8k, 128k) or equal to the array dims — a middle
            # singleton satisfies that for any batch size
            pl.BlockSpec(
                (1, 1, block_q), lambda b_, h_, qi, ki: (b_, 0, qi)
            ),
            pl.BlockSpec(
                (1, 1, block_k), lambda b_, h_, qi, ki: (b_, 0, ki)
            ),
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda b_, h_, qi, ki: (b_, h_ // rep, ki, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda b_, h_, qi, ki: (b_, h_ // rep, ki, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q_seg, kv_seg, q, k, v)
    return out


def _local_flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, window: int,
    block_q: int,
):
    """Single-pass block-diagonal attention: the kv block IS the q block;
    tokens only attend within their `window`-sized group (groups never
    straddle blocks because block_q % window == 0)."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 1)
    mask = (rows // window) == (cols // window)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    o = jax.lax.dot(p, v, preferred_element_type=jnp.float32) / l
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "window", "block_q", "interpret")
)
def _local_flash_call(q, k, v, *, scale, window, block_q, interpret):
    """q/k/v: (B, H, L, D) in window-major token order; L % block_q == 0."""
    b, h, l, d = q.shape
    grid = (b, h, l // block_q)
    kernel = functools.partial(
        _local_flash_kernel, scale=scale, window=window, block_q=block_q
    )
    spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b_, h_, qi: (b_, h_, qi, 0)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def window_reference(q, k, v, window: int, scale: float) -> jnp.ndarray:
    """Window-local XLA attention: reshape each `window`-token group into
    its own batch row and attend within it. Numerically identical to
    block-diagonal masking, but with per-window (W x W) logits instead of
    (L x L) — this is the CPU fallback AND the custom_vjp backward body."""
    b, l, h, d = q.shape
    nw = l // window
    qw = q.reshape(b * nw, window, h, d)
    kw = k.reshape(b * nw, window, h, d)
    vw = v.reshape(b * nw, window, h, d)
    out = mha_reference(qw, kw, vw, scale=scale)
    return out.reshape(b, l, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _window_attention_tpu(q, k, v, window, scale, block_q):
    # No manual head-dim padding: Mosaic accepts a last block dim equal to
    # the array dim (e.g. Hiera's 72) and pads lanes internally — measured
    # ~25% faster than padding to 128 in HBM first.
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _local_flash_call(
        qt, kt, vt, scale=scale, window=window, block_q=block_q,
        interpret=False,
    )
    return out.transpose(0, 2, 1, 3)


def _window_attention_fwd(q, k, v, window, scale, block_q):
    return _window_attention_tpu(q, k, v, window, scale, block_q), (q, k, v)


def _window_attention_bwd(window, scale, block_q, res, g):
    # pallas_call has no autodiff; backward re-derives through the
    # window-local XLA reference (needed e.g. when jax.grad runs over the
    # full UniGR param tree even though the Hiera trunk is frozen).
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: window_reference(q_, k_, v_, window, scale),
        q, k, v,
    )
    return vjp(g)


_window_attention_tpu.defvjp(_window_attention_fwd, _window_attention_bwd)


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window: int,
    *,
    scale: Optional[float] = None,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Block-diagonal windowed attention over (B, L, H, D) with tokens laid
    out window-major (every consecutive `window` tokens form one window).

    block_q default 512: measured best on v5e across the Hiera stage shapes
    (1024-blocks spill VMEM and waste MXU work on masked pairs; see
    STATUS.md round-1 notes).

    On TPU this runs the single-pass local Pallas kernel — no O(L·window)
    logits materialization in HBM (window-local XLA on CPU/tests).
    Differentiable: backward runs through the window-local XLA reference.
    Used by the Hiera trunk and reusable for the Qwen ViT.
    """
    b, l, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        return window_reference(q, k, v, window, scale)

    block = block_q
    while l % block != 0 or block % window != 0:
        block //= 2
        if block < window:
            block = window
            break
    if interpret:
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = _local_flash_call(
            qt, kt, vt, scale=scale, window=window, block_q=block,
            interpret=True,
        )
        return out.transpose(0, 2, 1, 3)
    return _window_attention_tpu(q, k, v, window, scale, block)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


def _pick_block(requested: int, length: int) -> int:
    pow2 = 1 << max(length - 1, 1).bit_length()
    return min(requested, max(128, pow2))


def _float0_zeros(x):
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _bundled_flash(q, k, v, q_seg, kv_seg, causal, scale):
    """Differentiable flash attention via the pallas-ops TPU kernel (which
    ships dq/dkv backward kernels). (B, L, H, D) in/out; kv heads must
    already be repeated to match q heads. Used ONLY inside the backward of
    our forward kernel — the forward path stays the faster custom kernel."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention as pallas_flash,
    )

    b, lq, h, d = q.shape
    lk = k.shape[1]
    # BHLD layout; pad head dim to a lane multiple first
    qt = _pad_to(q.transpose(0, 2, 1, 3), 3, 128)
    kt = _pad_to(k.transpose(0, 2, 1, 3), 3, 128)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 3, 128)
    # choose block sizes BEFORE seq padding, then pad each seq dim to a
    # multiple of its block: the upstream kernel requires
    # seq_len % block == 0, and a 128-padded length like 640 would fail
    # the divisibility check with a 512 block
    block_q_mult, block_k_mult = 128, 128
    block_sizes = None
    if qt.shape[3] > 128 and q.dtype == jnp.float32:
        # wide heads + f32: shrink tiles to stay under the 16MB scoped
        # VMEM (mirrors the forward wrapper's guard)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
        )

        blk_q = min(512, -(-lq // 128) * 128)
        blk_k = min(512, -(-lk // 128) * 128)
        block_q_mult, block_k_mult = blk_q, blk_k
        block_sizes = BlockSizes(
            block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
            block_q_major_dkv=blk_q, block_k_major_dkv=blk_k,
            block_k_dkv=blk_k, block_q_dkv=blk_q,
            block_k_major_dq=blk_k, block_k_dq=blk_k, block_q_dq=blk_q,
        )
    qt = _pad_to(qt, 2, block_q_mult)
    kt = _pad_to(kt, 2, block_k_mult)
    vt = _pad_to(vt, 2, block_k_mult)
    lq_p, lk_p = qt.shape[2], kt.shape[2]
    if q_seg is None:
        q_seg = jnp.zeros((b, lq), jnp.int32)
        kv_seg = jnp.zeros((b, lk), jnp.int32)
    q_seg_p = jnp.pad(
        q_seg.astype(jnp.int32), ((0, 0), (0, lq_p - lq)),
        constant_values=-2,
    )
    kv_seg_p = jnp.pad(
        kv_seg.astype(jnp.int32), ((0, 0), (0, lk_p - lk)),
        constant_values=-1,
    )
    out = pallas_flash(
        qt, kt, vt,
        segment_ids=SegmentIds(q=q_seg_p, kv=kv_seg_p),
        causal=causal, sm_scale=scale, block_sizes=block_sizes,
    )
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_tpu(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k, h):
    hkv = k.shape[2]
    lq, lk = q.shape[1], k.shape[1]
    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)
    kt = _pad_to(k.transpose(0, 2, 1, 3), 2, block_k)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 2, block_k)
    # padded kv must never match any real segment: pad kv with -1, q with -2
    q_seg_p = jnp.pad(
        q_seg, ((0, 0), (0, qt.shape[2] - lq)), constant_values=-2
    )
    kv_seg_p = jnp.pad(
        kv_seg, ((0, 0), (0, kt.shape[2] - lk)), constant_values=-1
    )
    out = _flash_call(
        qt, kt, vt, q_seg_p[:, None, :], kv_seg_p[:, None, :],
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        interpret=False, num_q_heads=h,
    )
    return out[:, :, :lq, :].transpose(0, 2, 1, 3)


def _flash_tpu_fwd(q, k, v, q_seg, kv_seg, causal, scale, bq, bk, h):
    out = _flash_tpu(q, k, v, q_seg, kv_seg, causal, scale, bq, bk, h)
    return out, (q, k, v, q_seg, kv_seg)


def _flash_tpu_bwd(causal, scale, bq, bk, h, res, g):
    # Backward through the pallas-ops flash kernels (one recompute forward
    # + dq/dkv passes — the standard flash recipe). GQA: repeat kv heads;
    # jnp.repeat's transpose sums the per-group head gradients.
    q, k, v, q_seg, kv_seg = res
    hkv = k.shape[2]
    rep = h // hkv

    def f(q_, k_, v_):
        k_r = jnp.repeat(k_, rep, axis=2) if rep > 1 else k_
        v_r = jnp.repeat(v_, rep, axis=2) if rep > 1 else v_
        return _bundled_flash(q_, k_r, v_r, q_seg, kv_seg, causal, scale)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, _float0_zeros(q_seg), _float0_zeros(kv_seg)


_flash_tpu.defvjp(_flash_tpu_fwd, _flash_tpu_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention, (B, L, H, D) layout, GQA-aware.

    Default 1024-blocks: on v5e the kernel at 1024x1024 blocks measures
    ~2.5-3ms for a 4096-token 8-head full attention (beats both the
    bundled pallas ops kernel and XLA); 256-blocks are pathologically slow
    on this backend.

    On non-TPU backends falls back to `mha_reference` (the Pallas TPU
    lowering is Mosaic-only; interpret=True is available for debugging).
    """
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        return mha_reference(
            q, k, v, causal=causal, segment_ids=segment_ids,
            kv_segment_ids=kv_segment_ids, scale=scale,
        )

    b, lq, h, d = q.shape
    _, lk, hkv, _ = k.shape
    if causal and lq != lk:
        # The TPU kernels (ours and the bundled backward) align the causal
        # mask top-left (q row 0 sees only k 0) while mha_reference aligns
        # bottom-right (tril k=lk-lq) — with lq != lk they'd silently
        # disagree across backends. No current caller needs it; refuse.
        raise NotImplementedError(
            "flash_attention(causal=True) requires lq == lk "
            f"(got lq={lq}, lk={lk}); use mha_reference for "
            "bottom-right-aligned cached/cross attention"
        )
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # Odd head dims (e.g. Hiera's 72) are NOT padded in HBM: Mosaic accepts
    # a last block dim equal to the array dim and pads lanes internally,
    # which measures ~25% faster than materializing a 128-wide copy first.

    if segment_ids is None:
        q_seg = jnp.zeros((b, lq), jnp.int32)
        kv_seg = jnp.zeros((b, lk), jnp.int32)
    else:
        q_seg = segment_ids.astype(jnp.int32)
        kv_seg = (
            kv_segment_ids if kv_segment_ids is not None else segment_ids
        ).astype(jnp.int32)

    if d > 128 and q.dtype == jnp.float32:
        # wide heads with f32 inputs overflow the 16MB scoped VMEM at
        # 1024-blocks (measured 16.57M at d=256); halve the tiles
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
    block_q = _pick_block(block_q, lq)
    block_k = _pick_block(block_k, lk)

    if interpret:
        qt = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)
        kt = _pad_to(k.transpose(0, 2, 1, 3), 2, block_k)
        vt = _pad_to(v.transpose(0, 2, 1, 3), 2, block_k)
        q_seg_p = jnp.pad(
            q_seg, ((0, 0), (0, qt.shape[2] - lq)), constant_values=-2
        )
        kv_seg_p = jnp.pad(
            kv_seg, ((0, 0), (0, kt.shape[2] - lk)), constant_values=-1
        )
        out = _flash_call(
            qt, kt, vt, q_seg_p[:, None, :], kv_seg_p[:, None, :],
            causal=causal, scale=scale,
            block_q=block_q, block_k=block_k, interpret=True,
            num_q_heads=h,
        )
        return out[:, :, :lq, :d].transpose(0, 2, 1, 3)
    return _flash_tpu(
        q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k, h
    )
