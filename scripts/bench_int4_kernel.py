"""A/B int4 dequant-matmul kernel variants at 7B decode shapes.

Round-2 chip numbers showed the int4 path LOSING to int8 (7B decode
39.7 vs 92.6 tok/s) despite half the weight HBM: the nibble unpack +
reshape-broadcast group scaling in `_int4_kernel` is VPU-bound
(~20 ms/step of dequant overhead vs a ~4.3 ms HBM floor). This bench
times isolated kernel variants on one representative 7B layer shape
so the dequant restructure can be chosen from data:

  v0  production kernel (signed nibbles, shift unpack, reshape-scale)
  v1  signed nibbles, shift unpack, group-partial dots with scales
      applied to the (m, out) partial products (no weight relayout)
  v2  float-unpack packing (byte = 16*hi + lo+8): ONE int8->float
      convert per byte, hi/lo recovered with mul+floor+fma in the
      compute dtype; group-partial dots; the lo half's -8 offset is
      folded into a per-group activation-sum correction

  python scripts/bench_int4_kernel.py --m 16 --in-dim 3584 --out 3584
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rga3_tpu.ops.quant import (
    INT4_GROUP, _int4_matmul_pallas, quantize_int4,
)


# ---------------------------------------------------------------------------
# v1: signed-nibble unpack (as v0) but scales hit the partial dot outputs
# ---------------------------------------------------------------------------
def _kernel_v1(x_lo_ref, x_hi_ref, q_ref, s_ref, out_ref, acc_ref,
               *, gs: int, n_lo: int):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = q_ref[:].astype(jnp.int32)
    hi = jnp.right_shift(p, 4)
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)
    hb, ob = q_ref.shape
    x_dtype = x_lo_ref.dtype
    g = hb // gs
    acc = acc_ref[:]
    for gi in range(gs):
        sl = slice(gi * g, (gi + 1) * g)
        a_lo = jnp.dot(x_lo_ref[:, sl], lo[sl].astype(x_dtype),
                       preferred_element_type=jnp.float32)
        a_hi = jnp.dot(x_hi_ref[:, sl], hi[sl].astype(x_dtype),
                       preferred_element_type=jnp.float32)
        s_lo = s_ref[i * gs + gi, :][None, :]
        s_hi = s_ref[n_lo + i * gs + gi, :][None, :]
        acc = acc + a_lo * s_lo + a_hi * s_hi
    acc_ref[:] = acc

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# v2: float-unpack packing. byte = 16*hi + (lo+8), hi,lo in [-7,7]
# ---------------------------------------------------------------------------
def pack_v2(q_lo: np.ndarray, q_hi: np.ndarray) -> np.ndarray:
    b = 16 * q_hi.astype(np.int16) + (q_lo.astype(np.int16) + 8)
    assert b.min() >= -128 and b.max() <= 127
    return b.astype(np.int8)


def _kernel_v2(x_lo_ref, x_hi_ref, q_ref, s_ref, out_ref, acc_ref,
               *, gs: int, n_lo: int):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x_dtype = x_lo_ref.dtype
    b = q_ref[:].astype(jnp.float32)
    hi = jnp.floor(b * (1.0 / 16.0))
    lo8 = b - hi * 16.0  # = lo + 8, in [1, 15]
    hi = hi.astype(x_dtype)
    lo8 = lo8.astype(x_dtype)
    hb, ob = q_ref.shape
    g = hb // gs
    acc = acc_ref[:]
    for gi in range(gs):
        sl = slice(gi * g, (gi + 1) * g)
        a_lo = jnp.dot(x_lo_ref[:, sl], lo8[sl],
                       preferred_element_type=jnp.float32)
        a_hi = jnp.dot(x_hi_ref[:, sl], hi[sl],
                       preferred_element_type=jnp.float32)
        s_lo = s_ref[i * gs + gi, :][None, :]
        s_hi = s_ref[n_lo + i * gs + gi, :][None, :]
        # the lo nibble's -8 offset is corrected OUTSIDE the kernel:
        # y -= 8 * (sum_g x_lo_g) * s_lo_g  == one (m, n_lo) @ (n_lo, out)
        # matmul on the host graph (per-column in-kernel loads are not
        # lane-aligned for Mosaic)
        acc = acc + a_lo * s_lo + a_hi * s_hi
    acc_ref[:] = acc

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run_variant(name, x2d, packed, scale_g, *, hb=256, ob=512,
                interpret=False):
    m, in_dim = x2d.shape
    half, out = packed.shape
    m_pad = max(16, m)
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    n_in = half // hb
    gs = hb // INT4_GROUP
    n_lo = half // INT4_GROUP

    if name == "v1":
        kern = functools.partial(_kernel_v1, gs=gs, n_lo=n_lo)
        in_specs = [
            pl.BlockSpec((m_pad, hb), lambda mi, o, i: (mi, i)),
            pl.BlockSpec((m_pad, hb), lambda mi, o, i: (mi, n_in + i)),
            pl.BlockSpec((hb, ob), lambda mi, o, i: (i, o)),
            pl.BlockSpec((2 * n_lo, ob), lambda mi, o, i: (0, o)),
        ]
        ops = (x2d, x2d, packed, scale_g)
    elif name == "v2":
        kern = functools.partial(_kernel_v2, gs=gs, n_lo=n_lo)
        in_specs = [
            pl.BlockSpec((m_pad, hb), lambda mi, o, i: (mi, i)),
            pl.BlockSpec((m_pad, hb), lambda mi, o, i: (mi, n_in + i)),
            pl.BlockSpec((hb, ob), lambda mi, o, i: (i, o)),
            pl.BlockSpec((2 * n_lo, ob), lambda mi, o, i: (0, o)),
        ]
        ops = (x2d, x2d, packed, scale_g)
    else:
        raise ValueError(name)

    y = pl.pallas_call(
        kern,
        grid=(1, out // ob, n_in),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, ob), lambda mi, o, i: (mi, o)),
        out_shape=jax.ShapeDtypeStruct((m_pad, out), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, ob), jnp.float32)],
        interpret=interpret,
    )(*ops)
    if name == "v2":
        # lo-offset correction: y -= 8 * sx @ scale_lo (tiny matmul,
        # fused by XLA into the output)
        x_lo = x2d[:, : in_dim // 2].astype(jnp.float32)
        sx = x_lo.reshape(m_pad, n_lo, INT4_GROUP).sum(-1)
        y = (
            y.astype(jnp.float32)
            - 8.0 * (sx @ scale_g[:n_lo].astype(jnp.float32))
        ).astype(x2d.dtype)
    return y[:m]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--in-dim", type=int, default=3584)
    p.add_argument("--out", type=int, default=3584)
    p.add_argument("--hb", type=int, default=256)
    p.add_argument("--ob", type=int, default=512)
    p.add_argument("--interpret", action="store_true",
                   help="CPU interpret-mode correctness check only")
    p.add_argument("--chain", type=int, default=0,
                   help="ALSO time a lax.scan chain of N layer matmuls "
                   "over stacked weights — the real decode layout. A "
                   "single matmul cannot discriminate variants (fixed "
                   "per-call overhead dominates); the chain exposes "
                   "whether scan's per-layer weight slice materializes "
                   "before the pallas custom call")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    w = rng.normal(size=(args.in_dim, args.out)).astype(np.float32) * 0.02
    x = jnp.asarray(
        rng.normal(size=(args.m, args.in_dim)).astype(np.float32)
    ).astype(jnp.bfloat16)

    packed_v0, scale_g = jax.jit(quantize_int4)(jnp.asarray(w))
    packed_v0 = jax.device_get(packed_v0)
    scale_np = jax.device_get(scale_g)
    # recover the signed nibbles to build v2's packing of the SAME values
    q_lo = (packed_v0.astype(np.int32) << 28) >> 28
    q_hi = packed_v0.astype(np.int32) >> 4
    packed_v2 = pack_v2(q_lo, q_hi)

    # reference result from the quantized values
    half = args.in_dim // 2
    g = INT4_GROUP
    wq = np.concatenate([q_lo, q_hi], axis=0).astype(np.float32)
    wq = (wq.reshape(args.in_dim // g, g, args.out)
          * scale_np[:, None, :]).reshape(args.in_dim, args.out)
    ref = np.asarray(x, np.float32) @ wq

    results = {}
    interp = args.interpret

    def check(name, y):
        y = np.asarray(jax.device_get(y), np.float32)
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-6)
        results[name + "_relerr"] = round(float(err), 5)
        assert err < 3e-2, (name, err)

    y0 = _int4_matmul_pallas(x, jnp.asarray(packed_v0),
                             jnp.asarray(scale_np), interpret=interp)
    check("v0", y0)
    y1 = run_variant("v1", x, jnp.asarray(packed_v0), jnp.asarray(scale_np),
                     hb=args.hb, ob=args.ob, interpret=interp)
    check("v1", y1)
    y2 = run_variant("v2", x, jnp.asarray(packed_v2), jnp.asarray(scale_np),
                     hb=args.hb, ob=args.ob, interpret=interp)
    check("v2", y2)

    if not interp and jax.default_backend() == "tpu":
        from rga3_tpu.utils.profiling import device_timeit

        pv0 = jnp.asarray(packed_v0)
        pv2 = jnp.asarray(packed_v2)
        sg = jnp.asarray(scale_np)
        results["v0_ms"] = device_timeit(
            lambda a: _int4_matmul_pallas(a, pv0, sg), x)
        results["v1_ms"] = device_timeit(
            lambda a: run_variant("v1", a, pv0, sg,
                                  hb=args.hb, ob=args.ob), x)
        results["v2_ms"] = device_timeit(
            lambda a: run_variant("v2", a, pv2, sg,
                                  hb=args.hb, ob=args.ob), x)
        # int8 and bf16 XLA references at the same shape
        w8 = jnp.asarray(
            np.clip(np.round(w / (np.abs(w).max(0) / 127)), -127, 127)
        ).astype(jnp.int8)
        s8 = jnp.asarray(np.abs(w) .max(0) / 127)
        results["int8_xla_ms"] = device_timeit(
            lambda a: (a @ w8.astype(a.dtype)) * s8.astype(a.dtype), x)
        wb = jnp.asarray(w).astype(jnp.bfloat16)
        results["bf16_xla_ms"] = device_timeit(lambda a: a @ wb, x)

        if args.chain:
            n = args.chain
            key = jax.random.PRNGKey(7)
            # n distinct stacked weights (square so the chain composes)
            pv0s = jnp.asarray(
                np.broadcast_to(packed_v0, (n,) + packed_v0.shape).copy()
            )
            sgs = jnp.asarray(
                np.broadcast_to(scale_np, (n,) + scale_np.shape).copy()
            )
            w8s = jnp.stack([w8] * n)
            s8s = jnp.stack([s8] * n)
            wbs = jnp.stack([wb] * n)

            def chain_v0(ws, a):
                def body(carry, wsc):
                    y = _int4_matmul_pallas(carry, wsc[0], wsc[1])
                    return y.astype(carry.dtype), None

                y, _ = jax.lax.scan(body, a, ws)
                return y

            def chain_i8(ws, a):
                def body(carry, wsc):
                    y = (carry @ wsc[0].astype(carry.dtype)) * wsc[
                        1
                    ].astype(carry.dtype)
                    return y.astype(carry.dtype), None

                y, _ = jax.lax.scan(body, a, ws)
                return y

            def chain_bf(ws, a):
                def body(carry, wk):
                    return (carry @ wk).astype(carry.dtype), None

                y, _ = jax.lax.scan(body, a, ws)
                return y

            pert = lambda a_, i: (a_[0], a_[1] + i.astype(a_[1].dtype))
            results["chain_n"] = n
            results["chain_v0_ms"] = device_timeit(
                chain_v0, (pv0s, sgs), x, iters=20, perturb=pert)
            results["chain_int8_xla_ms"] = device_timeit(
                chain_i8, (w8s, s8s), x, iters=20, perturb=pert)
            results["chain_bf16_xla_ms"] = device_timeit(
                chain_bf, wbs, x, iters=20, perturb=pert)
            # unrolled pallas chain: no scan slice in front of the kernel
            idx = list(range(n))

            def chain_v0_unroll(ws, a):
                pv, sg_ = ws
                y = a
                for i in idx:
                    y = _int4_matmul_pallas(y, pv[i], sg_[i]).astype(
                        a.dtype
                    )
                return y

            results["chain_v0_unrolled_ms"] = device_timeit(
                chain_v0_unroll, (pv0s, sgs), x, iters=20, perturb=pert)

            # v1/v2 chains (scan form) — the restructure candidates at
            # the realistic stacked-decode shape
            def chain_variant(name, packed_all):
                def run(ws, a):
                    def body(carry, wsc):
                        y = run_variant(name, carry, wsc[0], wsc[1],
                                        hb=args.hb, ob=args.ob)
                        return y.astype(carry.dtype), None

                    y, _ = jax.lax.scan(body, a, ws)
                    return y

                return device_timeit(
                    run, (packed_all, sgs), x, iters=20, perturb=pert
                )

            results["chain_v1_ms"] = chain_variant("v1", pv0s)
            pv2s = jnp.asarray(
                np.broadcast_to(packed_v2, (n,) + packed_v2.shape).copy()
            )
            results["chain_v2_ms"] = chain_variant("v2", pv2s)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
