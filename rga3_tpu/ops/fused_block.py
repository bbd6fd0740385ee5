"""Fused windowed transformer block (Pallas TPU).

One kernel for the Hiera non-pooling windowed block — LN1 -> qkv ->
block-diagonal window attention -> proj -> residual -> LN2 -> MLP (GELU,
variant per gelu_variant below) -> residual — with every intermediate kept in VMEM
and the weights
resident across grid steps (constant BlockSpec index map). Replaces the
per-op XLA graph where each of ~10 ops round-trips activations through
HBM; on the 1024² Hiera-L trunk stage 3 alone runs 33 such blocks
(ref: model/sam2.py:1034-1148 MultiScaleBlock — this is its fused
TPU-native equivalent for the dim==dim_out, no-q-pool case).

Layout contract: x is (B, L, D) with tokens window-major (every
consecutive `window` tokens form one attention group) — the same
convention as `ops.attention.window_attention`. block_q % window == 0 or
window % block_q == 0 is NOT required in general; we require
block_q % window == 0 so groups never straddle blocks.

VMEM budget at block_q=256: weights resident = 2*D*(3D + D + 8D) bytes
(bf16) — 8 MB at D=576 (Hiera-L stage 3), plus ~4 MB activations; fits
the ~16 MB/core VMEM. Stage 4 (D=1152, 32 MB weights) must NOT use this
kernel — callers gate on D.
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

# GELU inside the fused kernels: tanh approximation by default — the
# HieraConfig.gelu_tanh field is the source of truth (captured in saved
# configs); RGA3_GELU_EXACT=1/0 is a process-wide override for A/B runs.
# The kernels cast the GELU output to bf16 (~4e-3 relative rounding) so
# the tanh deviation (~3e-4 absolute) is an order of magnitude below the
# quantization already applied; the VPU saving is large — interleaved A/B
# on v5e measures the SAM2 decode bench at 46.4 vs 42.0 fps (+10.5%).
import os as _os


def gelu_variant(cfg_tanh: Optional[bool] = None) -> bool:
    """Resolve the GELU variant: env override > config field > tanh."""
    env = _os.environ.get("RGA3_GELU_EXACT", "")
    if env == "1":
        return False
    if env == "0":
        return True
    return True if cfg_tanh is None else bool(cfg_tanh)


def _vmem_budget_bytes() -> int:
    """Scoped-VMEM budget the kernels size their blocks against.

    Default 14 MiB leaves headroom under XLA's 16 MiB scoped-vmem limit
    (--xla_tpu_scoped_vmem_limit_kib default). RGA3_SCOPED_VMEM_MIB lets
    perf experiments that raise the XLA flag tell the kernels about the
    bigger budget (set both together)."""
    mib = _os.environ.get("RGA3_SCOPED_VMEM_MIB", "")
    return (int(mib) if mib else 14) * 2**20


def _transition_vmem_limit_bytes() -> int:
    """Mosaic scoped-vmem ceiling for the transition kernel (which sets
    compiler_params itself, unlike the XLA-flag-governed fused block).
    Well above the block-sizing target so a modest estimator error
    degrades pipelining instead of failing the compile, and big enough
    that the stage-4 entry block (29 MB of bf16 weights at k_w=1) can
    stay VMEM-resident; v5e VMEM is 128 MiB total."""
    return min(max(2 * _vmem_budget_bytes(), 64 * 2**20), 100 * 2**20)


def _gelu_f32(x, tanh: bool = True):
    if tanh:
        # same tanh form _reference_block uses via jax.nn.gelu — one
        # source of truth for kernel forward and reference backward
        return jax.nn.gelu(x, approximate=True)
    return 0.5 * x * (1.0 + _erf_poly(x * (1.0 / math.sqrt(2.0))))


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 erf (max abs err 1.5e-7 — far below bf16
    resolution). Mosaic lowers exp but not erf/erfc."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _layernorm(x32, g, b, eps):
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * g + b


def _fused_kernel(
    x_ref, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
    ln2_g, ln2_b, w1, b1, w2, b2, o_ref,
    *, num_heads: int, head_dim: int, window: int, block_q: int,
    eps: float, scale: float, gelu_tanh: bool,
):
    xb = x_ref[0]  # (block_q, D) bf16
    d = xb.shape[-1]

    # --- LN1 (f32 stats, like torch nn.LayerNorm on bf16 input) ---
    ln1 = _layernorm(
        xb.astype(jnp.float32), ln1_g[0].astype(jnp.float32),
        ln1_b[0].astype(jnp.float32), eps,
    ).astype(xb.dtype)

    # --- qkv projection ---
    qkv = (
        jax.lax.dot(ln1, wqkv[...], preferred_element_type=jnp.float32)
        + bqkv[0].astype(jnp.float32)
    ).astype(xb.dtype)  # (block_q, 3*H*hd)

    # --- block-diagonal window attention, head by head ---
    if window < block_q:
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 1)
        same = (rows // window) == (cols // window)
    else:
        same = None
    outs = []
    hd = head_dim
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, (num_heads + h) * hd:(num_heads + h + 1) * hd]
        v = qkv[:, (2 * num_heads + h) * hd:(2 * num_heads + h + 1) * hd]
        s = jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale
        if same is not None:
            s = jnp.where(same, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(
            (p / l).astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        outs.append(o.astype(xb.dtype))
    attn = jnp.concatenate(outs, axis=-1)  # (block_q, D)

    # --- output projection + residual (bf16 adds, like the reference) ---
    proj = (
        jax.lax.dot(attn, wproj[...], preferred_element_type=jnp.float32)
        + bproj[0].astype(jnp.float32)
    ).astype(xb.dtype)
    y = xb + proj

    # --- LN2 + MLP (GELU, variant per gelu_tanh) + residual ---
    ln2 = _layernorm(
        y.astype(jnp.float32), ln2_g[0].astype(jnp.float32),
        ln2_b[0].astype(jnp.float32), eps,
    ).astype(xb.dtype)
    h1 = (
        jax.lax.dot(ln2, w1[...], preferred_element_type=jnp.float32)
        + b1[0].astype(jnp.float32)
    ).astype(xb.dtype)
    h1f = h1.astype(jnp.float32)
    g = _gelu_f32(h1f, gelu_tanh).astype(xb.dtype)
    h2 = (
        jax.lax.dot(g, w2[...], preferred_element_type=jnp.float32)
        + b2[0].astype(jnp.float32)
    ).astype(xb.dtype)
    o_ref[0] = y + h2


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "window", "block_q", "eps", "scale", "interpret",
        "gelu_tanh",
    ),
)
def _fused_call(
    x, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj, ln2_g, ln2_b, w1, b1, w2, b2,
    *, num_heads, window, block_q, eps, scale, interpret, gelu_tanh=True,
):
    b, l, d = x.shape
    hd = d // num_heads
    grid = (b, l // block_q)
    x_spec = pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0))

    def const(shape):
        return pl.BlockSpec(shape, lambda b_, qi: tuple(0 for _ in shape))

    kernel = functools.partial(
        _fused_kernel, num_heads=num_heads, head_dim=hd, window=window,
        block_q=block_q, eps=eps, scale=scale, gelu_tanh=gelu_tanh,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec,
            const((1, d)), const((1, d)),          # ln1 g/b
            const((d, 3 * d)), const((1, 3 * d)),  # wqkv/bqkv
            const((d, d)), const((1, d)),          # wproj/bproj
            const((1, d)), const((1, d)),          # ln2 g/b
            const((d, w1.shape[1])), const((1, w1.shape[1])),
            const((w1.shape[1], d)), const((1, d)),
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(
        x, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
        ln2_g, ln2_b, w1, b1, w2, b2,
    )


def _reference_block(
    x, p, *, num_heads: int, window: int, eps: float, scale: float,
    gelu_tanh: bool = True,
):
    """Pure-XLA mirror of the fused kernel (CPU fallback + test oracle).
    Matches hiera.MultiScaleBlock's math for dim==dim_out, no q-pool."""
    b, l, d = x.shape

    def ln(v, g, bb):
        # one LN definition for kernel forward AND these vjp-backward
        # reference bodies (_layernorm) — keeps fwd/bwd numerics in sync
        return _layernorm(v.astype(jnp.float32), g, bb, eps).astype(v.dtype)

    ln1 = ln(x, p["ln1_g"], p["ln1_b"])
    qkv = (
        (ln1 @ p["wqkv"]).astype(jnp.float32) + p["bqkv"]
    ).astype(x.dtype)
    qkv = qkv.reshape(b, l, 3, num_heads, d // num_heads)
    from .attention import window_reference

    attn = window_reference(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], window, scale
    ).reshape(b, l, d)
    proj = (
        (attn @ p["wproj"]).astype(jnp.float32) + p["bproj"]
    ).astype(x.dtype)
    y = x + proj
    ln2 = ln(y, p["ln2_g"], p["ln2_b"])
    h1 = ((ln2 @ p["w1"]).astype(jnp.float32) + p["b1"]).astype(x.dtype)
    g = jax.nn.gelu(h1, approximate=gelu_tanh)
    h2 = ((g @ p["w2"]).astype(jnp.float32) + p["b2"]).astype(x.dtype)
    return y + h2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _fused_block_tpu(x, params, num_heads, window, block_q, eps, scale,
                     gelu_tanh):
    def row(v):
        return v.reshape(1, -1)

    return _fused_call(
        x,
        row(params["ln1_g"]), row(params["ln1_b"]),
        params["wqkv"], row(params["bqkv"]),
        params["wproj"], row(params["bproj"]),
        row(params["ln2_g"]), row(params["ln2_b"]),
        params["w1"], row(params["b1"]),
        params["w2"], row(params["b2"]),
        num_heads=num_heads, window=window, block_q=block_q, eps=eps,
        scale=scale, interpret=False, gelu_tanh=gelu_tanh,
    )


def _fused_block_fwd(x, params, num_heads, window, block_q, eps, scale,
                     gelu_tanh):
    out = _fused_block_tpu(
        x, params, num_heads, window, block_q, eps, scale, gelu_tanh
    )
    return out, (x, params)


def _fused_block_bwd(num_heads, window, block_q, eps, scale, gelu_tanh,
                     res, g):
    # pallas_call has no autodiff; recompute through the XLA reference
    # (rematerialization — residuals are just the inputs). Required because
    # UniGR training takes jax.grad over the full param tree even though
    # the Hiera trunk is frozen (grads are zeroed by the optimizer mask).
    x, params = res
    _, vjp = jax.vjp(
        lambda x_, p_: _reference_block(
            x_, p_, num_heads=num_heads, window=window, eps=eps,
            scale=scale, gelu_tanh=gelu_tanh,
        ),
        x, params,
    )
    return vjp(g)


_fused_block_tpu.defvjp(_fused_block_fwd, _fused_block_bwd)


# ---------------------------------------------------------------------------
# Split fusion for GLOBAL-attention blocks: LN+qkv prologue and
# proj+residual+LN+MLP epilogue around a full flash attention (whose kv
# footprint cannot live in one VMEM block). Used by Hiera's 3 global
# blocks (ref model/sam2.py:148-163 global_att_blocks).
# ---------------------------------------------------------------------------


def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps):
    xb = x_ref[0]
    ln = _layernorm(
        xb.astype(jnp.float32), g_ref[0].astype(jnp.float32),
        b_ref[0].astype(jnp.float32), eps,
    ).astype(xb.dtype)
    o_ref[0] = (
        jax.lax.dot(ln, w_ref[...], preferred_element_type=jnp.float32)
        + bias_ref[0].astype(jnp.float32)
    ).astype(xb.dtype)


def _proj_mlp_kernel(
    attn_ref, x_ref, wproj, bproj, ln2_g, ln2_b, w1, b1, w2, b2, o_ref,
    *, eps: float, gelu_tanh: bool,
):
    xb = x_ref[0]
    proj = (
        jax.lax.dot(
            attn_ref[0], wproj[...], preferred_element_type=jnp.float32
        )
        + bproj[0].astype(jnp.float32)
    ).astype(xb.dtype)
    y = xb + proj
    ln2 = _layernorm(
        y.astype(jnp.float32), ln2_g[0].astype(jnp.float32),
        ln2_b[0].astype(jnp.float32), eps,
    ).astype(xb.dtype)
    h1 = (
        jax.lax.dot(ln2, w1[...], preferred_element_type=jnp.float32)
        + b1[0].astype(jnp.float32)
    ).astype(xb.dtype)
    h1f = h1.astype(jnp.float32)
    g = _gelu_f32(h1f, gelu_tanh).astype(xb.dtype)
    h2 = (
        jax.lax.dot(g, w2[...], preferred_element_type=jnp.float32)
        + b2[0].astype(jnp.float32)
    ).astype(xb.dtype)
    o_ref[0] = y + h2


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape))


@functools.partial(
    jax.jit, static_argnames=("block_q", "eps", "interpret")
)
def _ln_qkv_call(x, g, b, w, bias, *, block_q, eps, interpret):
    bsz, l, d = x.shape
    out_d = w.shape[1]
    return pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(bsz, l // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
            _const_spec((1, d)), _const_spec((1, d)),
            _const_spec((d, out_d)), _const_spec((1, out_d)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, out_d), lambda b_, qi: (b_, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, l, out_d), x.dtype),
        interpret=interpret,
    )(x, g, b, w, bias)


@functools.partial(
    jax.jit, static_argnames=("block_q", "eps", "interpret", "gelu_tanh")
)
def _proj_mlp_call(
    attn, x, wproj, bproj, ln2_g, ln2_b, w1, b1, w2, b2,
    *, block_q, eps, interpret, gelu_tanh=True,
):
    bsz, l, d = x.shape
    f = w1.shape[1]
    tok = pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0))
    return pl.pallas_call(
        functools.partial(_proj_mlp_kernel, eps=eps, gelu_tanh=gelu_tanh),
        grid=(bsz, l // block_q),
        in_specs=[
            tok, tok,
            _const_spec((d, d)), _const_spec((1, d)),
            _const_spec((1, d)), _const_spec((1, d)),
            _const_spec((d, f)), _const_spec((1, f)),
            _const_spec((f, d)), _const_spec((1, d)),
        ],
        out_specs=tok,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(attn, x, wproj, bproj, ln2_g, ln2_b, w1, b1, w2, b2)


def _reference_global_block(x, p, *, num_heads, eps, scale,
                            gelu_tanh=True):
    """XLA mirror of the global-attention block (CPU fallback + vjp body)."""
    b, l, d = x.shape

    def ln(v, g, bb):
        # one LN definition for kernel forward AND these vjp-backward
        # reference bodies (_layernorm) — keeps fwd/bwd numerics in sync
        return _layernorm(v.astype(jnp.float32), g, bb, eps).astype(v.dtype)

    ln1 = ln(x, p["ln1_g"], p["ln1_b"])
    qkv = ((ln1 @ p["wqkv"]).astype(jnp.float32) + p["bqkv"]).astype(x.dtype)
    qkv = qkv.reshape(b, l, 3, num_heads, d // num_heads)
    from .attention import mha_reference

    attn = mha_reference(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale=scale
    ).reshape(b, l, d)
    proj = ((attn @ p["wproj"]).astype(jnp.float32) + p["bproj"]).astype(
        x.dtype
    )
    y = x + proj
    ln2 = ln(y, p["ln2_g"], p["ln2_b"])
    h1 = ((ln2 @ p["w1"]).astype(jnp.float32) + p["b1"]).astype(x.dtype)
    g = jax.nn.gelu(h1, approximate=gelu_tanh)
    h2 = ((g @ p["w2"]).astype(jnp.float32) + p["b2"]).astype(x.dtype)
    return y + h2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _global_block_tpu(x, params, num_heads, block_q, eps, scale, gelu_tanh):
    from .attention import flash_attention

    b, l, d = x.shape

    def row(v):
        return v.reshape(1, -1)

    qkv = _ln_qkv_call(
        x, row(params["ln1_g"]), row(params["ln1_b"]),
        params["wqkv"], row(params["bqkv"]),
        block_q=block_q, eps=eps, interpret=False,
    ).reshape(b, l, 3, num_heads, d // num_heads)
    attn = flash_attention(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale=scale
    ).reshape(b, l, d)
    return _proj_mlp_call(
        attn, x, params["wproj"], row(params["bproj"]),
        row(params["ln2_g"]), row(params["ln2_b"]),
        params["w1"], row(params["b1"]),
        params["w2"], row(params["b2"]),
        block_q=block_q, eps=eps, interpret=False, gelu_tanh=gelu_tanh,
    )


def _global_block_fwd(x, params, num_heads, block_q, eps, scale, gelu_tanh):
    return _global_block_tpu(
        x, params, num_heads, block_q, eps, scale, gelu_tanh
    ), (x, params)


def _global_block_bwd(num_heads, block_q, eps, scale, gelu_tanh, res, g):
    x, params = res
    _, vjp = jax.vjp(
        lambda x_, p_: _reference_global_block(
            x_, p_, num_heads=num_heads, eps=eps, scale=scale,
            gelu_tanh=gelu_tanh,
        ),
        x, params,
    )
    return vjp(g)


_global_block_tpu.defvjp(_global_block_fwd, _global_block_bwd)


def fused_global_block(
    x: jnp.ndarray,
    params: dict,
    *,
    num_heads: int,
    eps: float = 1e-6,
    scale: Optional[float] = None,
    block_q: int = 512,
    interpret: bool = False,
    gelu_tanh: Optional[bool] = None,
) -> jnp.ndarray:
    """Global-attention transformer block: Pallas LN+qkv prologue, flash
    attention, Pallas proj+LN+MLP epilogue. Same params dict as
    fused_window_block."""
    b, l, d = x.shape
    gelu_tanh = gelu_variant(gelu_tanh)
    if scale is None:
        scale = 1.0 / math.sqrt(d // num_heads)
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        return _reference_global_block(
            x, params, num_heads=num_heads, eps=eps, scale=scale,
            gelu_tanh=gelu_tanh,
        )
    block = block_q
    while l % block != 0:
        block //= 2
    if interpret:
        def row(v):
            return v.reshape(1, -1)

        qkv = _ln_qkv_call(
            x, row(params["ln1_g"]), row(params["ln1_b"]),
            params["wqkv"], row(params["bqkv"]),
            block_q=block, eps=eps, interpret=True,
        ).reshape(b, l, 3, num_heads, d // num_heads)
        from .attention import mha_reference

        attn = mha_reference(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale=scale
        ).reshape(b, l, d)
        return _proj_mlp_call(
            attn, x, params["wproj"], row(params["bproj"]),
            row(params["ln2_g"]), row(params["ln2_b"]),
            params["w1"], row(params["b1"]),
            params["w2"], row(params["b2"]),
            block_q=block, eps=eps, interpret=True, gelu_tanh=gelu_tanh,
        )
    return _global_block_tpu(
        x, params, num_heads, block, eps, scale, gelu_tanh
    )


# ---------------------------------------------------------------------------
# Split fusion for WIDE windowed blocks (Hiera stage 4, D=1152): the full
# fused kernel cannot hold 32 MB of weights in VMEM, so the block runs as
# Pallas LN+qkv prologue -> block-diagonal window-attention kernel ->
# Pallas proj+residual+LN kernel -> Pallas MLP kernel blocked over the
# hidden dim with on-chip f32 accumulation.
# ---------------------------------------------------------------------------


def _proj_ln_kernel(
    attn_ref, x_ref, wproj, bproj, ln2_g, ln2_b, y_ref, ln2y_ref, *, eps
):
    xb = x_ref[0]
    proj = (
        jax.lax.dot(
            attn_ref[0], wproj[...], preferred_element_type=jnp.float32
        )
        + bproj[0].astype(jnp.float32)
    ).astype(xb.dtype)
    y = xb + proj
    y_ref[0] = y
    ln2y_ref[0] = _layernorm(
        y.astype(jnp.float32), ln2_g[0].astype(jnp.float32),
        ln2_b[0].astype(jnp.float32), eps,
    ).astype(xb.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "eps", "interpret"))
def _proj_ln_call(attn, x, wproj, bproj, ln2_g, ln2_b, *, block_q, eps,
                  interpret):
    bsz, l, d = x.shape
    tok = pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0))
    return pl.pallas_call(
        functools.partial(_proj_ln_kernel, eps=eps),
        grid=(bsz, l // block_q),
        in_specs=[
            tok, tok,
            _const_spec((d, d)), _const_spec((1, d)),
            _const_spec((1, d)), _const_spec((1, d)),
        ],
        out_specs=[tok, tok],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        ],
        interpret=interpret,
    )(attn, x, wproj, bproj, ln2_g, ln2_b)


def _mlp_blocked_kernel(ln2y_ref, y_ref, w1, b1, w2, b2, o_ref, *,
                        gelu_tanh: bool):
    """Grid (B, L/bq, F/bf), hidden-dim blocks innermost; o (f32) is
    revisited across f and accumulated in VMEM."""
    f = pl.program_id(2)
    h1 = (
        jax.lax.dot(ln2y_ref[0], w1[...], preferred_element_type=jnp.float32)
        + b1[0].astype(jnp.float32)
    ).astype(ln2y_ref.dtype)
    h1f = h1.astype(jnp.float32)
    g = _gelu_f32(h1f, gelu_tanh).astype(ln2y_ref.dtype)
    part = jax.lax.dot(g, w2[...], preferred_element_type=jnp.float32)

    @pl.when(f == 0)
    def _():
        o_ref[0] = (
            y_ref[0].astype(jnp.float32) + b2[0].astype(jnp.float32) + part
        )

    @pl.when(f != 0)
    def _():
        o_ref[0] += part


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_f", "interpret", "gelu_tanh")
)
def _mlp_blocked_call(ln2y, y, w1, b1, w2, b2, *, block_q, block_f,
                      interpret, gelu_tanh=True):
    bsz, l, d = y.shape
    fdim = w1.shape[1]
    tok = pl.BlockSpec((1, block_q, d), lambda b_, qi, f: (b_, qi, 0))
    out = pl.pallas_call(
        functools.partial(_mlp_blocked_kernel, gelu_tanh=gelu_tanh),
        grid=(bsz, l // block_q, fdim // block_f),
        in_specs=[
            tok, tok,
            pl.BlockSpec((d, block_f), lambda b_, qi, f: (0, f)),
            pl.BlockSpec((1, block_f), lambda b_, qi, f: (0, f)),
            pl.BlockSpec((block_f, d), lambda b_, qi, f: (f, 0)),
            _const_spec((1, d)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b_, qi, f: (b_, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, l, d), jnp.float32),
        interpret=interpret,
    )(ln2y, y, w1, b1, w2, b2)
    return out.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _split_window_block_tpu(
    x, params, num_heads, window, block_q, block_f, eps, scale, gelu_tanh
):
    from .attention import window_attention

    b, l, d = x.shape

    def row(v):
        return v.reshape(1, -1)

    qkv = _ln_qkv_call(
        x, row(params["ln1_g"]), row(params["ln1_b"]),
        params["wqkv"], row(params["bqkv"]),
        block_q=block_q, eps=eps, interpret=False,
    ).reshape(b, l, 3, num_heads, d // num_heads)
    attn = window_attention(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], window, scale=scale
    ).reshape(b, l, d)
    y, ln2y = _proj_ln_call(
        attn, x, params["wproj"], row(params["bproj"]),
        row(params["ln2_g"]), row(params["ln2_b"]),
        block_q=block_q, eps=eps, interpret=False,
    )
    return _mlp_blocked_call(
        ln2y, y, params["w1"], row(params["b1"]),
        params["w2"], row(params["b2"]),
        block_q=block_q, block_f=block_f, interpret=False,
        gelu_tanh=gelu_tanh,
    )


def _split_window_block_fwd(
    x, params, num_heads, window, block_q, block_f, eps, scale, gelu_tanh
):
    out = _split_window_block_tpu(
        x, params, num_heads, window, block_q, block_f, eps, scale,
        gelu_tanh,
    )
    return out, (x, params)


def _split_window_block_bwd(
    num_heads, window, block_q, block_f, eps, scale, gelu_tanh, res, g
):
    x, params = res
    _, vjp = jax.vjp(
        lambda x_, p_: _reference_block(
            x_, p_, num_heads=num_heads, window=window, eps=eps,
            scale=scale, gelu_tanh=gelu_tanh,
        ),
        x, params,
    )
    return vjp(g)


_split_window_block_tpu.defvjp(_split_window_block_fwd,
                               _split_window_block_bwd)


def fused_window_block_split(
    x: jnp.ndarray,
    params: dict,
    *,
    num_heads: int,
    window: int,
    eps: float = 1e-6,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_f: int = 512,
    interpret: bool = False,
    gelu_tanh: Optional[bool] = None,
) -> jnp.ndarray:
    """Windowed transformer block for dims whose weights exceed VMEM (same
    params dict and layout contract as fused_window_block).

    Default blocks sized for D=1152 under the 16 MB scoped-vmem limit with
    Mosaic's input double-buffering: w1/w2 f-blocks stream (2x 1.2 MB each
    buffered twice), token blocks 0.6 MB, f32 accumulator 1.2 MB. block_f
    must be a multiple of 128 (Mosaic lane-dim divisibility)."""
    b, l, d = x.shape
    gelu_tanh = gelu_variant(gelu_tanh)
    if scale is None:
        scale = 1.0 / math.sqrt(d // num_heads)
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        return _reference_block(
            x, params, num_heads=num_heads, window=window, eps=eps,
            scale=scale, gelu_tanh=gelu_tanh,
        )
    block = block_q
    while l % block != 0 or block % window != 0:
        block //= 2
        if block < window:
            block = window
            break
    fdim = params["w1"].shape[1]
    bf = block_f
    while fdim % bf != 0:
        bf //= 2
    if bf % 128 != 0 and not interpret:
        # Mosaic requires lane-dim blocks in multiples of 128; odd hidden
        # dims fall back to the XLA block rather than failing to lower
        return _reference_block(
            x, params, num_heads=num_heads, window=window, eps=eps,
            scale=scale, gelu_tanh=gelu_tanh,
        )
    if interpret:
        def row(v):
            return v.reshape(1, -1)

        from .attention import window_reference

        qkv = _ln_qkv_call(
            x, row(params["ln1_g"]), row(params["ln1_b"]),
            params["wqkv"], row(params["bqkv"]),
            block_q=block, eps=eps, interpret=True,
        ).reshape(b, l, 3, num_heads, d // num_heads)
        attn = window_reference(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], window, scale
        ).reshape(b, l, d)
        y, ln2y = _proj_ln_call(
            attn, x, params["wproj"], row(params["bproj"]),
            row(params["ln2_g"]), row(params["ln2_b"]),
            block_q=block, eps=eps, interpret=True,
        )
        return _mlp_blocked_call(
            ln2y, y, params["w1"], row(params["b1"]),
            params["w2"], row(params["b2"]),
            block_q=block, block_f=bf, interpret=True, gelu_tanh=gelu_tanh,
        )
    return _split_window_block_tpu(
        x, params, num_heads, window, block, bf, eps, scale, gelu_tanh
    )


def fused_window_block(
    x: jnp.ndarray,
    params: dict,
    *,
    num_heads: int,
    window: int,
    eps: float = 1e-6,
    scale: Optional[float] = None,
    block_q: int = 256,
    interpret: bool = False,
    gelu_tanh: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused windowed transformer block over (B, L, D), window-major.

    params: ln1_g, ln1_b (D,), wqkv (D,3D), bqkv (3D,), wproj (D,D),
    bproj (D,), ln2_g, ln2_b (D,), w1 (D,F), b1 (F,), w2 (F,D), b2 (D,).
    qkv column order is (q|k|v) x heads x head_dim — flax Dense + reshape
    (L, 3, H, hd), the hiera.MultiScaleBlock convention.
    """
    b, l, d = x.shape
    gelu_tanh = gelu_variant(gelu_tanh)
    if scale is None:
        scale = 1.0 / math.sqrt(d // num_heads)
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        return _reference_block(
            x, params, num_heads=num_heads, window=window, eps=eps,
            scale=scale, gelu_tanh=gelu_tanh,
        )

    block = block_q
    while l % block != 0 or block % window != 0:
        block //= 2
        if block < window:
            block = window
            break

    # scoped-VMEM estimate: resident weights + double-buffered token
    # blocks + f32 scores/temporaries. Shrink the block until it fits the
    # 16MB limit (a bad config otherwise fails at Mosaic lowering — the
    # D=576/block=512 combo measures 16.54M).
    def vmem_bytes(blk):
        f = params["w1"].shape[1]
        weights = 2 * d * (3 * d + d + 2 * f)  # bf16
        toks = 2 * 2 * blk * d * 2  # x in + out, double-buffered, bf16
        scores = blk * blk * 4  # f32 attention scores (per head, serial)
        temps = blk * (3 * d + f) * 2 + blk * f * 4  # qkv + h1 + h1f
        return weights + toks + scores + temps

    while block > window and vmem_bytes(block) > _vmem_budget_bytes():
        block //= 2
    if block % window != 0:
        # halving can break the groups-never-straddle-blocks invariant
        # (e.g. 768 -> 384 with window 256); snap down to one window
        block = window

    if interpret:
        def row(v):
            return v.reshape(1, -1)

        return _fused_call(
            x,
            row(params["ln1_g"]), row(params["ln1_b"]),
            params["wqkv"], row(params["bqkv"]),
            params["wproj"], row(params["bproj"]),
            row(params["ln2_g"]), row(params["ln2_b"]),
            params["w1"], row(params["b1"]),
            params["w2"], row(params["b2"]),
            num_heads=num_heads, window=window, block_q=block, eps=eps,
            scale=scale, interpret=True, gelu_tanh=gelu_tanh,
        )
    return _fused_block_tpu(
        x, params, num_heads, window, block, eps, scale, gelu_tanh
    )


# ---------------------------------------------------------------------------
# Fused q-pool TRANSITION block: the three stage-entry Hiera blocks
# (dim != dim_out, 2x2 query pooling; ref model/sam2.py MultiScaleBlock
# with q_stride — blocks 2/8/44 of Hiera-L). One kernel runs
# LN1 -> proj(+2x2 maxpool shortcut) -> qkv -> pooled-q window attention
# -> attn proj -> residual -> LN2 -> MLP, with all weights VMEM-resident.
# ---------------------------------------------------------------------------


def transition_vmem_bytes(
    kw: int, win: int, c_in: int, c_out: int, f: int
) -> int:
    """Scoped-VMEM estimate for one transition-kernel grid step.

    Counts resident weights, double-buffered in/out blocks, the f32
    attention scores, and the f32 matmul outputs that materialize before
    the bf16 casts (Mosaic does not fuse the cast into the matmul) — the
    r2b chip session measured 17.34M actual vs an 11.7M estimate without
    the f32 terms, which tripped the 16 MiB scoped-vmem compile limit."""
    t_in = kw * win
    t_out = kw * win // 4
    weights = 2 * (
        c_in * (c_out + 3 * c_out) + c_out * c_out + 2 * c_out * f
    )
    toks = 2 * 2 * t_in * c_in  # in, double-buffered, bf16
    out = 2 * 2 * t_out * c_out  # out, double-buffered, bf16
    scores = t_out * t_in * 4  # f32, per head serial
    f32_tmps = 4 * (
        t_in * c_in + t_in * c_out + t_in * 3 * c_out + t_out * f
    )
    temps = t_in * (3 * c_out + c_out) * 2 + t_out * f * 2
    return weights + toks + out + scores + f32_tmps + temps


def _pick_transition_block_windows(
    n_win: int, win: int, c_in: int, c_out: int, f: int,
    block_windows: Optional[int] = None,
) -> Optional[int]:
    """Choose windows-per-grid-step for the transition kernel.

    Targets ~256 query rows per step (fills the MXU M dim), halves while
    the VMEM estimate exceeds the sizing budget, and returns None when
    even k_w=1 would blow the raised Mosaic ceiling (fall back to XLA)."""
    if block_windows is None:
        block_windows = max(1, 256 // (win // 4))
    k_w = min(block_windows, n_win)
    while n_win % k_w != 0:
        k_w -= 1
    while k_w > 1 and (
        transition_vmem_bytes(k_w, win, c_in, c_out, f)
        > _vmem_budget_bytes()
    ):
        k_w //= 2
        while n_win % k_w != 0:
            k_w -= 1
    if (transition_vmem_bytes(k_w, win, c_in, c_out, f)
            > _transition_vmem_limit_bytes() - 4 * 2**20):
        return None
    return k_w


def _pool_win_2x2(t: jnp.ndarray, k_w: int, ws: int) -> jnp.ndarray:
    """(k_w*ws*ws, C) window-major row-major tokens -> 2x2 spatial max
    per window -> (k_w*(ws//2)**2, C). Never straddles window borders
    (ws is even for every Hiera stage)."""
    c = t.shape[-1]
    t6 = t.reshape(k_w, ws // 2, 2, ws // 2, 2, c)
    p = jnp.max(jnp.max(t6, axis=4), axis=2)
    return p.reshape(k_w * (ws // 2) * (ws // 2), c)


def _transition_kernel(
    x_ref, ln1_g, ln1_b, wproj, bproj, wqkv, bqkv, wattn, battn,
    ln2_g, ln2_b, w1, b1, w2, b2, o_ref,
    *, num_heads: int, head_dim: int, ws: int, block_windows: int,
    eps: float, scale: float, gelu_tanh: bool,
):
    xb = x_ref[0]  # (k_w*ws*ws, C_in) bf16
    k_w = block_windows
    win = ws * ws
    q_win = (ws // 2) ** 2
    hd = head_dim

    ln1 = _layernorm(
        xb.astype(jnp.float32), ln1_g[0].astype(jnp.float32),
        ln1_b[0].astype(jnp.float32), eps,
    ).astype(xb.dtype)

    # residual shortcut: proj at full res, then 2x2 max pool
    proj = (
        jax.lax.dot(ln1, wproj[...], preferred_element_type=jnp.float32)
        + bproj[0].astype(jnp.float32)
    ).astype(xb.dtype)  # (T_in, C_out)
    shortcut = _pool_win_2x2(proj, k_w, ws)  # (T_out, C_out)

    qkv = (
        jax.lax.dot(ln1, wqkv[...], preferred_element_type=jnp.float32)
        + bqkv[0].astype(jnp.float32)
    ).astype(xb.dtype)  # (T_in, 3*H*hd)

    if k_w > 1:
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (k_w * q_win, k_w * win), 0
        )
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (k_w * q_win, k_w * win), 1
        )
        same = (rows // q_win) == (cols // win)
    else:
        same = None
    outs = []
    for h in range(num_heads):
        q = _pool_win_2x2(qkv[:, h * hd:(h + 1) * hd], k_w, ws)
        k = qkv[:, (num_heads + h) * hd:(num_heads + h + 1) * hd]
        v = qkv[:, (2 * num_heads + h) * hd:(2 * num_heads + h + 1) * hd]
        s = jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale
        if same is not None:
            s = jnp.where(same, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(
            (p / l).astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        outs.append(o.astype(xb.dtype))
    attn = jnp.concatenate(outs, axis=-1)  # (T_out, C_out)

    aout = (
        jax.lax.dot(attn, wattn[...], preferred_element_type=jnp.float32)
        + battn[0].astype(jnp.float32)
    ).astype(xb.dtype)
    y = shortcut + aout

    ln2 = _layernorm(
        y.astype(jnp.float32), ln2_g[0].astype(jnp.float32),
        ln2_b[0].astype(jnp.float32), eps,
    ).astype(xb.dtype)
    h1 = (
        jax.lax.dot(ln2, w1[...], preferred_element_type=jnp.float32)
        + b1[0].astype(jnp.float32)
    ).astype(xb.dtype)
    g = _gelu_f32(h1.astype(jnp.float32), gelu_tanh).astype(xb.dtype)
    h2 = (
        jax.lax.dot(g, w2[...], preferred_element_type=jnp.float32)
        + b2[0].astype(jnp.float32)
    ).astype(xb.dtype)
    o_ref[0] = y + h2


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "ws", "block_windows", "eps", "scale", "interpret",
        "gelu_tanh",
    ),
)
def _transition_call(
    x, ln1_g, ln1_b, wproj, bproj, wqkv, bqkv, wattn, battn,
    ln2_g, ln2_b, w1, b1, w2, b2,
    *, num_heads, ws, block_windows, eps, scale, interpret, gelu_tanh,
):
    b, l_in, c_in = x.shape
    win = ws * ws
    n_win = l_in // win
    c_out = wproj.shape[1]
    hd = c_out // num_heads
    k_w = block_windows
    grid = (b, n_win // k_w)
    x_spec = pl.BlockSpec((1, k_w * win, c_in), lambda b_, wi: (b_, wi, 0))
    l_out = n_win * (ws // 2) ** 2
    o_spec = pl.BlockSpec(
        (1, k_w * (ws // 2) ** 2, c_out), lambda b_, wi: (b_, wi, 0)
    )

    def const(shape):
        return pl.BlockSpec(shape, lambda b_, wi: tuple(0 for _ in shape))

    kernel = functools.partial(
        _transition_kernel, num_heads=num_heads, head_dim=hd, ws=ws,
        block_windows=k_w, eps=eps, scale=scale, gelu_tanh=gelu_tanh,
    )
    f = w1.shape[1]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec,
            const((1, c_in)), const((1, c_in)),        # ln1 g/b
            const((c_in, c_out)), const((1, c_out)),   # proj
            const((c_in, 3 * c_out)), const((1, 3 * c_out)),  # qkv
            const((c_out, c_out)), const((1, c_out)),  # attn proj
            const((1, c_out)), const((1, c_out)),      # ln2 g/b
            const((c_out, f)), const((1, f)),
            const((f, c_out)), const((1, c_out)),
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, l_out, c_out), x.dtype),
        interpret=interpret,
        # block sizing targets _vmem_budget_bytes(); raise the Mosaic
        # scoped-vmem ceiling well above it so a modest estimator error
        # degrades pipelining instead of failing the whole compile (the
        # r2b chip session died on XLA's default 16 MiB scope here)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_transition_vmem_limit_bytes(),
        ),
    )(
        x, ln1_g, ln1_b, wproj, bproj, wqkv, bqkv, wattn, battn,
        ln2_g, ln2_b, w1, b1, w2, b2,
    )


def _reference_transition(
    x, p, *, num_heads: int, ws: int, eps: float, scale: float,
    gelu_tanh: bool = True,
):
    """Pure-XLA mirror of the transition kernel on the same window-major
    (B, L_in, C_in) token layout (CPU fallback + vjp-backward body)."""
    b, l_in, c_in = x.shape
    win = ws * ws
    n_win = l_in // win
    c_out = p["wproj"].shape[1]
    hd = c_out // num_heads

    def ln(v, g, bb):
        return _layernorm(v.astype(jnp.float32), g, bb, eps).astype(v.dtype)

    def pool(t):  # (B, n_win*win, C) -> (B, n_win*win//4, C)
        c = t.shape[-1]
        t6 = t.reshape(b, n_win, ws // 2, 2, ws // 2, 2, c)
        return jnp.max(jnp.max(t6, axis=5), axis=3).reshape(b, -1, c)

    ln1 = ln(x, p["ln1_g"], p["ln1_b"])
    shortcut = pool(
        ((ln1 @ p["wproj"]).astype(jnp.float32) + p["bproj"]).astype(x.dtype)
    )
    qkv = ((ln1 @ p["wqkv"]).astype(jnp.float32) + p["bqkv"]).astype(x.dtype)
    qkv = qkv.reshape(b, l_in, 3, num_heads, hd)
    q = pool(qkv[:, :, 0].reshape(b, l_in, num_heads * hd))
    q = q.reshape(b * n_win, win // 4, num_heads, hd)
    k = qkv[:, :, 1].reshape(b * n_win, win, num_heads, hd)
    v = qkv[:, :, 2].reshape(b * n_win, win, num_heads, hd)
    from .attention import mha_reference

    attn = mha_reference(q, k, v, scale=scale).reshape(
        b, n_win * win // 4, c_out
    )
    aout = (
        (attn @ p["wattn"]).astype(jnp.float32) + p["battn"]
    ).astype(x.dtype)
    y = shortcut + aout
    ln2 = ln(y, p["ln2_g"], p["ln2_b"])
    h1 = ((ln2 @ p["w1"]).astype(jnp.float32) + p["b1"]).astype(x.dtype)
    g = jax.nn.gelu(h1, approximate=gelu_tanh)
    h2 = ((g @ p["w2"]).astype(jnp.float32) + p["b2"]).astype(x.dtype)
    return y + h2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _transition_tpu(x, params, num_heads, ws, block_windows, eps, scale,
                    gelu_tanh):
    def row(v):
        return v.reshape(1, -1)

    return _transition_call(
        x,
        row(params["ln1_g"]), row(params["ln1_b"]),
        params["wproj"], row(params["bproj"]),
        params["wqkv"], row(params["bqkv"]),
        params["wattn"], row(params["battn"]),
        row(params["ln2_g"]), row(params["ln2_b"]),
        params["w1"], row(params["b1"]),
        params["w2"], row(params["b2"]),
        num_heads=num_heads, ws=ws, block_windows=block_windows, eps=eps,
        scale=scale, interpret=False, gelu_tanh=gelu_tanh,
    )


def _transition_fwd(x, params, num_heads, ws, block_windows, eps, scale,
                    gelu_tanh):
    out = _transition_tpu(
        x, params, num_heads, ws, block_windows, eps, scale, gelu_tanh
    )
    return out, (x, params)


def _transition_bwd(num_heads, ws, block_windows, eps, scale, gelu_tanh,
                    res, g):
    x, params = res
    _, vjp = jax.vjp(
        lambda x_, p_: _reference_transition(
            x_, p_, num_heads=num_heads, ws=ws, eps=eps, scale=scale,
            gelu_tanh=gelu_tanh,
        ),
        x, params,
    )
    return vjp(g)


_transition_tpu.defvjp(_transition_fwd, _transition_bwd)


def fused_transition_block(
    x: jnp.ndarray,
    params: dict,
    *,
    num_heads: int,
    ws: int,
    eps: float = 1e-6,
    scale: Optional[float] = None,
    block_windows: Optional[int] = None,
    interpret: bool = False,
    gelu_tanh: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused q-pool transition block over window-major tokens.

    x: (B, n_win*ws*ws, C_in); returns (B, n_win*(ws//2)**2, C_out).
    params: ln1_g/b (C_in,), wproj (C_in,C_out)+bproj, wqkv (C_in,3*C_out)
    +bqkv, wattn (C_out,C_out)+battn, ln2_g/b (C_out,), w1 (C_out,F)+b1,
    w2 (F,C_out)+b2. qkv column order (q|k|v) x heads x head_dim.
    """
    b, l_in, c_in = x.shape
    win = ws * ws
    n_win = l_in // win
    c_out = params["wproj"].shape[1]
    f = params["w1"].shape[1]
    gelu_tanh = gelu_variant(gelu_tanh)
    if scale is None:
        scale = 1.0 / math.sqrt(c_out // num_heads)

    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        return _reference_transition(
            x, params, num_heads=num_heads, ws=ws, eps=eps, scale=scale,
            gelu_tanh=gelu_tanh,
        )

    k_w = _pick_transition_block_windows(
        n_win, win, c_in, c_out, f, block_windows=block_windows
    )
    if k_w is None:
        # even k_w=1 exceeds the raised Mosaic ceiling (huge dims) — run
        # the XLA reference instead of failing the compile
        return _reference_transition(
            x, params, num_heads=num_heads, ws=ws, eps=eps, scale=scale,
            gelu_tanh=gelu_tanh,
        )

    if interpret:
        def row(v):
            return v.reshape(1, -1)

        return _transition_call(
            x,
            row(params["ln1_g"]), row(params["ln1_b"]),
            params["wproj"], row(params["bproj"]),
            params["wqkv"], row(params["bqkv"]),
            params["wattn"], row(params["battn"]),
            row(params["ln2_g"]), row(params["ln2_b"]),
            params["w1"], row(params["b1"]),
            params["w2"], row(params["b2"]),
            num_heads=num_heads, ws=ws, block_windows=k_w, eps=eps,
            scale=scale, interpret=True, gelu_tanh=gelu_tanh,
        )
    return _transition_tpu(
        x, params, num_heads, ws, k_w, eps, scale, gelu_tanh
    )
