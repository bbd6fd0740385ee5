"""On-chip validation of the Pallas kernels and their custom_vjp backwards.

The CPU test suite (tests/conftest.py forces the CPU backend) exercises the
XLA fallback paths only; this script runs the real Mosaic kernels on the
TPU and checks forward + gradient agreement against the XLA references.
Tolerances are MXU-rounding-aware: f32 matmul inputs are rounded to bf16
on the MXU at default precision, so ~1e-2 relative is expected noise for
squared-loss gradient comparisons (structure errors show up orders of
magnitude larger).

Run: python scripts/tpu_checks.py   (~2-4 min incl. compiles)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rga3_tpu.ops.attention import (
        flash_attention,
        mha_reference,
        window_attention,
        window_reference,
    )
    from rga3_tpu.ops.fused_block import _reference_block, fused_window_block

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    failures = []

    def close(name, a, b, tol):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        status = "ok" if rel < tol else f"FAIL (rel {rel:.2e} > {tol})"
        print(f"  {name}: {status}")
        if rel >= tol:
            failures.append(name)

    # ---- flash attention: forward + grads across configs ----
    print("flash_attention:")
    for name, (B, L, H, Hkv, D, causal, segs, dt) in {
        "causal f32 hd128": (2, 512, 4, 4, 128, True, False, jnp.float32),
        "gqa causal segs bf16": (2, 512, 8, 2, 128, True, True, jnp.bfloat16),
        "full d72 (hiera global)": (2, 512, 8, 8, 72, False, False, jnp.float32),
        "non-128 L": (2, 384, 4, 4, 128, True, False, jnp.float32),
    }.items():
        q = jnp.asarray(rng.normal(size=(B, L, H, D)), dt)
        k = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), dt)
        v = jnp.asarray(rng.normal(size=(B, L, Hkv, D)), dt)
        seg = (
            jnp.asarray((np.arange(L) // (L // 4))[None].repeat(B, 0))
            if segs else None
        )

        def lf(q, k, v):
            o = flash_attention(q, k, v, causal=causal, segment_ids=seg)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def lr(q, k, v):
            o = mha_reference(q, k, v, causal=causal, segment_ids=seg)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(q, k, v)
        for a, b, n in zip(gf, gr, "qkv"):
            close(f"{name} d{n}", a, b, 3e-2)

    # ---- window attention: forward + grads ----
    print("window_attention:")
    B, L, H, hd, W = 2, 1024, 2, 72, 64
    q = jnp.asarray(rng.normal(size=(B, L, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, hd)), jnp.float32)
    close(
        "forward", window_attention(q, k, v, W),
        window_reference(q, k, v, W, 1 / np.sqrt(hd)), 1e-2,
    )
    ga = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(window_attention(q, k, v, W) ** 2),
        argnums=(0, 1, 2),
    ))(q, k, v)
    gr = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            window_reference(q, k, v, W, 1 / np.sqrt(hd)) ** 2
        ),
        argnums=(0, 1, 2),
    ))(q, k, v)
    for a, b, n in zip(ga, gr, "qkv"):
        close(f"grad d{n}", a, b, 1e-2)

    # ---- fused block: forward + grads over all params ----
    print("fused_window_block:")
    B, L, D, H, W = 2, 1024, 128, 2, 64
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    p = {kk: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05)
         for kk, s in {
             "ln1_g": (D,), "ln1_b": (D,), "wqkv": (D, 3 * D),
             "bqkv": (3 * D,), "wproj": (D, D), "bproj": (D,),
             "ln2_g": (D,), "ln2_b": (D,), "w1": (D, 4 * D),
             "b1": (4 * D,), "w2": (4 * D, D), "b2": (D,),
         }.items()}
    p["ln1_g"] = p["ln1_g"] + 1.0
    p["ln2_g"] = p["ln2_g"] + 1.0
    ref_fn = lambda x, p: _reference_block(
        x, p, num_heads=H, window=W, eps=1e-6, scale=1 / np.sqrt(D // H)
    )
    close(
        "forward", fused_window_block(x, p, num_heads=H, window=W),
        ref_fn(x, p), 1e-2,
    )
    gf = jax.jit(jax.grad(
        lambda p, x: jnp.sum(
            fused_window_block(x, p, num_heads=H, window=W) ** 2
        )
    ))(p, x)
    gr = jax.jit(jax.grad(lambda p, x: jnp.sum(ref_fn(x, p) ** 2)))(p, x)
    for kk in p:
        close(f"grad {kk}", gf[kk], gr[kk], 1e-2)

    # ---- global block (LN+qkv / flash / proj+MLP split fusion) ----
    from rga3_tpu.ops.fused_block import (
        _reference_global_block,
        fused_global_block,
    )

    print("fused_global_block:")
    ref_g = lambda x, p: _reference_global_block(
        x, p, num_heads=H, eps=1e-6, scale=1 / np.sqrt(D // H)
    )
    close(
        "forward", fused_global_block(x, p, num_heads=H), ref_g(x, p), 1e-2
    )
    gf = jax.jit(jax.grad(
        lambda p, x: jnp.sum(fused_global_block(x, p, num_heads=H) ** 2)
    ))(p, x)
    gr = jax.jit(jax.grad(lambda p, x: jnp.sum(ref_g(x, p) ** 2)))(p, x)
    for kk in p:
        close(f"grad {kk}", gf[kk], gr[kk], 1e-2)

    # ---- cross attention, memory-attention shape (Lq != Lk, hd 256,
    # kv-validity as segment ids — models/sam2/memory.py flash path) ----
    print("flash cross-attention (memory bank shape):")
    B2, LQ, LK, HD = 1, 4096, 4096 * 7 + 64, 256
    # bf16 like the model path; f32 at this width auto-halves the tiles
    q = jnp.asarray(rng.normal(size=(B2, LQ, 1, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B2, LK, 1, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B2, LK, 1, HD)), jnp.bfloat16)
    kv_valid = jnp.asarray(
        (rng.random((B2, LK)) > 0.3).astype(np.int32)
    )
    q_seg = jnp.ones((B2, LQ), jnp.int32)
    close(
        "forward",
        flash_attention(
            q, k, v, segment_ids=q_seg, kv_segment_ids=kv_valid
        ),
        mha_reference(
            q, k, v, segment_ids=q_seg, kv_segment_ids=kv_valid
        ),
        1e-2,
    )

    # ---- split window block (wide-dim path: blocked-MLP accumulation) ----
    from rga3_tpu.ops.fused_block import fused_window_block_split

    print("fused_window_block_split:")
    close(
        "forward",
        fused_window_block_split(
            x, p, num_heads=H, window=W, block_q=256, block_f=128
        ),
        ref_fn(x, p), 1e-2,
    )
    gf = jax.jit(jax.grad(
        lambda p, x: jnp.sum(
            fused_window_block_split(
                x, p, num_heads=H, window=W, block_q=256, block_f=128
            ) ** 2
        )
    ))(p, x)
    gr = jax.jit(jax.grad(lambda p, x: jnp.sum(ref_fn(x, p) ** 2)))(p, x)
    for kk in p:
        close(f"grad {kk}", gf[kk], gr[kk], 1e-2)

    # ---- q-pool transition block (stage-entry: pooled q, dim change) ----
    from rga3_tpu.ops.fused_block import (
        _reference_transition,
        fused_transition_block,
    )

    print("fused_transition_block:")
    n_win, ws, CI, CO, Ht = 16, 8, 64, 128, 4
    xt = jnp.asarray(
        rng.normal(size=(2, n_win * ws * ws, CI)), jnp.float32
    )
    pt = {kk: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05)
          for kk, s in {
              "ln1_g": (CI,), "ln1_b": (CI,), "wproj": (CI, CO),
              "bproj": (CO,), "wqkv": (CI, 3 * CO), "bqkv": (3 * CO,),
              "wattn": (CO, CO), "battn": (CO,), "ln2_g": (CO,),
              "ln2_b": (CO,), "w1": (CO, 4 * CO), "b1": (4 * CO,),
              "w2": (4 * CO, CO), "b2": (CO,),
          }.items()}
    pt["ln1_g"] = pt["ln1_g"] + 1.0
    pt["ln2_g"] = pt["ln2_g"] + 1.0
    ref_t = lambda x_, p_: _reference_transition(
        x_, p_, num_heads=Ht, ws=ws, eps=1e-6, scale=1 / np.sqrt(CO // Ht)
    )
    close(
        "forward",
        fused_transition_block(xt, pt, num_heads=Ht, ws=ws),
        ref_t(xt, pt), 1e-2,
    )
    gf = jax.jit(jax.grad(
        lambda p_, x_: jnp.sum(
            fused_transition_block(x_, p_, num_heads=Ht, ws=ws) ** 2
        )
    ))(pt, xt)
    gr = jax.jit(jax.grad(lambda p_, x_: jnp.sum(ref_t(x_, p_) ** 2)))(pt, xt)
    for kk in pt:
        close(f"grad {kk}", gf[kk], gr[kk], 1e-2)

    # --- int4 dequant-matmul kernel (ops/quant.py) vs the XLA halves path
    from rga3_tpu.ops.quant import (
        _int4_unpack_halves, int4_matmul, quantize_int4,
    )

    for (IN, OUT, M) in [(512, 512, 1), (3584, 512, 3), (18944, 256, 16)]:
        w4 = jnp.asarray(rng.normal(size=(IN, OUT)) * 0.05, jnp.float32)
        x4 = jnp.asarray(rng.normal(size=(M, IN)), jnp.bfloat16)
        q4, sg = quantize_int4(w4)
        wl, wh = _int4_unpack_halves(q4, sg, jnp.bfloat16)
        ref4 = x4[..., : IN // 2] @ wl + x4[..., IN // 2:] @ wh
        close(
            f"int4 kernel {IN}x{OUT} M={M}",
            int4_matmul(x4, q4, sg), ref4, 5e-2,
        )

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all TPU kernel checks passed")


if __name__ == "__main__":
    main()
