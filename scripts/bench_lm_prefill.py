"""Decompose LM prefill time at the train-step shape (seq 512, batch 1-2).

The train-step MFU gap traced to the *forward* (fwd-only 119.7 of
168.2 ms at remat=none), and within it the LM prefill leg runs at
~0.27 MFU. This microbench times the pieces ON DEVICE (device_timeit)
to find where the cycles go:

  lm_full        embed + 36 layers + norm + lm_head
  lm_no_head     same without the (2048 x 152k) lm_head matmul
  lm_unrolled    scan_layers=False A/B (weight-prefetch pipelining)
  layer_matmuls  bare XLA matmul chain of one decoder layer x 36
                 (the MXU ceiling for these shapes)

  python scripts/bench_lm_prefill.py --seq 512 --batch 1
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config smoke run (CPU)")
    p.add_argument("--unrolled", action="store_true",
                   help="also time scan_layers=False (WARNING: the "
                   "unrolled 3B graph compiles 10-30x slower through "
                   "this environment's remote-compile tunnel)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rga3_tpu.models.qwen25vl import QWEN25_VL_3B
    from rga3_tpu.models.qwen25vl.language import QwenForCausalLM
    from rga3_tpu.utils.flops import dense, qwen_lm_flops
    from rga3_tpu.utils.profiling import device_timeit, mfu

    B, L = args.batch, args.seq
    if args.tiny:
        from rga3_tpu.models.qwen25vl import tiny_config

        tcfg = tiny_config(vocab_size=1024).text
    else:
        tcfg = QWEN25_VL_3B.text.replace(lora_rank=8, lora_alpha=16.0)
    tcfg = tcfg.replace(lora_rank=8, lora_alpha=16.0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 10_000, size=(B, L)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(L)[None, None], (3, B, L))

    results = {"batch": B, "seq": L}
    fl_full = qwen_lm_flops(tcfg, B * L)
    # lm_head share
    fl_head = dense(B * L, tcfg.hidden_size, tcfg.vocab_size)

    def build(scan):
        model = QwenForCausalLM(tcfg.replace(scan_layers=scan))
        shapes = jax.eval_shape(
            lambda k: model.init(
                k, input_ids=ids[:, :8], position_ids=pos[:, :, :8]
            ),
            jax.random.PRNGKey(0),
        )
        from flax.core import meta

        @jax.jit
        def mk(k):
            return jax.tree.map(
                lambda s: (jax.random.normal(k, s.shape) * 0.02).astype(
                    jnp.bfloat16
                ),
                meta.unbox(shapes),
            )

        params = mk(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        return model, params

    model, params = build(scan=True)

    # params/weights are passed as ARGUMENTS (and perturb varies the ids
    # arg): closing over a 3B tree bakes ~6 GB of constants into the HLO
    # and stalls the remote compiler (see .claude/skills/verify)
    def pert_ids(a, i):
        return (a[0], (a[1] + i.astype(jnp.int32)) % 900)

    def run_full(p, ids_):
        out = model.apply(
            p, input_ids=ids_, position_ids=pos,
            compute_dtype=jnp.bfloat16,
        )
        return out["logits"]

    def run_no_head(p, ids_):
        def body(m):
            h = m.embed_tokens(ids_).astype(jnp.bfloat16)
            return m.model(h, pos, None, None)[0]

        return model.apply(p, method=body)

    ms = device_timeit(run_full, params, ids, iters=args.iters,
                       perturb=pert_ids)
    results["lm_full_ms"] = round(ms, 2)
    results["lm_full_mfu"] = round(mfu(fl_full, ms / 1e3), 4)
    try:
        ms = device_timeit(run_no_head, params, ids, iters=args.iters,
                           perturb=pert_ids)
        results["lm_no_head_ms"] = round(ms, 2)
        results["lm_no_head_mfu"] = round(
            mfu(fl_full - fl_head, ms / 1e3), 4
        )
    except Exception as e:  # inner-module apply is best-effort
        results["lm_no_head_error"] = str(e)[:120]

    if args.unrolled:
        model_u, params_u = build(scan=False)

        def run_unrolled(p, ids_):
            out = model_u.apply(
                p, input_ids=ids_, position_ids=pos,
                compute_dtype=jnp.bfloat16,
            )
            return out["logits"]

        ms = device_timeit(run_unrolled, params_u, ids, iters=args.iters,
                           perturb=pert_ids)
        results["lm_unrolled_ms"] = round(ms, 2)
        results["lm_unrolled_mfu"] = round(mfu(fl_full, ms / 1e3), 4)

    # bare matmul chain: q,k,v,o + gate,up,down per layer, 36 layers —
    # the XLA ceiling for exactly these GEMM shapes (no norms/rope/attn)
    h, inter = tcfg.hidden_size, tcfg.intermediate_size
    kvh = tcfg.num_key_value_heads * tcfg.head_dim
    key = jax.random.PRNGKey(1)
    Ws = {
        "q": jax.random.normal(key, (h, h), jnp.bfloat16) * 0.02,
        "k": jax.random.normal(key, (h, kvh), jnp.bfloat16) * 0.02,
        "v": jax.random.normal(key, (h, kvh), jnp.bfloat16) * 0.02,
        "o": jax.random.normal(key, (h, h), jnp.bfloat16) * 0.02,
        "g": jax.random.normal(key, (h, inter), jnp.bfloat16) * 0.02,
        "u": jax.random.normal(key, (h, inter), jnp.bfloat16) * 0.02,
        "d": jax.random.normal(key, (inter, h), jnp.bfloat16) * 0.02,
    }
    Ws = {k: jnp.stack([v] * tcfg.num_hidden_layers) for k, v in Ws.items()}

    def chain(ws, x):
        def body(carry, w):
            x = carry
            q = x @ w["q"]
            k = x @ w["k"]
            v = x @ w["v"]
            x = x + q @ w["o"]
            # keep k/v matmuls live without changing shapes
            x = x + (k.sum(-1) + v.sum(-1))[:, None].astype(x.dtype) * 1e-6
            gg = jax.nn.silu(x @ w["g"]) * (x @ w["u"])
            x = x + gg @ w["d"]
            return x.astype(jnp.bfloat16), None

        y, _ = jax.lax.scan(body, x, ws)
        return y

    x0 = jnp.asarray(
        rng.normal(size=(B * L, h)).astype(np.float32), jnp.bfloat16
    )
    fl_chain = tcfg.num_hidden_layers * (
        dense(B * L, h, h) * 2 + dense(B * L, h, kvh) * 2
        + dense(B * L, h, inter) * 2 + dense(B * L, inter, h)
    )
    ms = device_timeit(
        chain, Ws, x0, iters=args.iters,
        perturb=lambda a, i: (a[0], a[1] + i.astype(a[1].dtype)),
    )
    results["layer_matmuls_ms"] = round(ms, 2)
    results["layer_matmuls_mfu"] = round(mfu(fl_chain, ms / 1e3), 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
