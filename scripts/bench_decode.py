"""LLM decode-throughput benchmark (the VideoInfer QA hot loop:
KV-cached greedy decode — ref inference_videoinfer.py:312-321).

Runs the Qwen2.5-VL text stack at a selectable size with random weights
generated on-device (host->device transfer through this environment's
tunnel is slow) and scan_layers=True (small XLA graph). Prints JSON with
prefill tok/s and decode tok/s.

  python scripts/bench_decode.py --size 3b --prefill 512 --decode 64
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", choices=["tiny", "3b", "7b"], default="3b")
    p.add_argument("--prefill", type=int, default=512)
    p.add_argument("--decode", type=int, default=64)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument(
        "--int8", action="store_true",
        help="weight-only int8 (ops.quant): halves weight HBM traffic",
    )
    p.add_argument(
        "--kv-int8", dest="kv_int8", action="store_true",
        help="int8 KV cache: halves the cache's decode HBM stream",
    )
    p.add_argument(
        "--int4", action="store_true",
        help="weight-only int4 (nibble-packed, group-32 scales): "
        "~4x less weight HBM traffic",
    )
    args = p.parse_args()
    assert not (args.int8 and args.int4), "--int8 and --int4 are exclusive"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rga3_tpu.models.qwen25vl import (
        QWEN25_VL_3B, QWEN25_VL_7B, tiny_config,
    )
    from rga3_tpu.models.qwen25vl.language import (
        QwenForCausalLM, make_kv_cache,
    )

    qcfg = {
        "tiny": tiny_config(),
        "3b": QWEN25_VL_3B,
        "7b": QWEN25_VL_7B,
    }[args.size]
    cfg = qcfg.text.replace(
        scan_layers=True, quant_int8=args.int8, quant_int4=args.int4,
        kv_cache_int8=args.kv_int8,
    )
    model = QwenForCausalLM(cfg)
    quant = args.int8 or args.int4
    init_cfg = cfg.replace(quant_int8=False, quant_int4=False)
    init_model = QwenForCausalLM(init_cfg) if quant else model

    rng = np.random.default_rng(0)
    B, L, D = args.batch, args.prefill, args.decode
    ids = jnp.asarray(
        rng.integers(0, min(cfg.vocab_size, 100_000), (B, L)), jnp.int32
    )

    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda k: init_model.init(k, input_ids=ids), key
    )

    def make_params(k):
        from flax.core import meta

        if quant:
            # leaf-wise generate+quantize: a single whole-tree jit peaks
            # at fp + quantized + temps, which OOMs 7B on a 16G chip
            from rga3_tpu.ops.quant import random_quantized_params

            return {
                "params": random_quantized_params(
                    meta.unbox(shapes)["params"], bits=4 if args.int4 else 8
                )
            }
        gen = jax.jit(
            lambda kk: jax.tree.map(
                lambda s: (jax.random.normal(kk, s.shape) * 0.02).astype(
                    jnp.bfloat16
                ),
                meta.unbox(shapes),
            )
        )
        return gen(k)

    t0 = time.time()
    params = make_params(key)
    jax.block_until_ready(params)
    print(f"# params ready in {time.time()-t0:.1f}s", file=sys.stderr)

    max_len = L + D

    @jax.jit
    def prefill(params, ids):
        cache = make_kv_cache(cfg, B, max_len, dtype=jnp.bfloat16)
        out = model.apply(
            params, input_ids=ids, cache=cache,
            compute_dtype=jnp.bfloat16,
            logits_indices=jnp.full((B,), L - 1, jnp.int32),
        )
        tok = jnp.argmax(out["logits"][:, 0], axis=-1).astype(jnp.int32)
        return out["cache"], tok

    @jax.jit
    def decode(params, cache, tok):
        def step(carry, _):
            cache, tok = carry
            out = model.apply(
                params, input_ids=tok[:, None], cache=cache,
                compute_dtype=jnp.bfloat16,
            )
            nxt = jnp.argmax(out["logits"][:, -1], axis=-1).astype(
                jnp.int32
            )
            return (out["cache"], nxt), nxt
        (_, _), toks = jax.lax.scan(step, (cache, tok), None, length=D)
        return toks

    # compile + warmup
    t0 = time.time()
    cache, tok = prefill(params, ids)
    toks = decode(params, cache, tok)
    first = np.asarray(toks)  # force full execution
    t_compile = time.time() - t0
    print(f"# compile+first run {t_compile:.1f}s", file=sys.stderr)

    # queue several async dispatches and fetch ONE combined scalar — the
    # relay's ~32 ms scalar round-trip would otherwise dominate the
    # ~20 ms prefill (a single-call timing overstated it >2x)
    K = 8
    t0 = time.time()
    acc = None
    for i in range(K):
        _, tok_i = prefill(params, ids + i)
        acc = tok_i if acc is None else acc + tok_i
    np.asarray(acc)
    t_prefill = (time.time() - t0) / K

    t0 = time.time()
    acc = None
    for i in range(3):
        toks = decode(params, cache, tok + i)
        acc = toks if acc is None else acc + toks
    np.asarray(acc)
    t_decode = (time.time() - t0) / 3

    print(json.dumps({
        "size": args.size,
        "quant": "int4" if args.int4 else ("int8" if args.int8 else "bf16"),
        "prefill_tokens_per_sec": round(B * L / t_prefill, 1),
        "decode_tokens_per_sec": round(B * D / t_decode, 1),
        "prefill_ms": round(t_prefill * 1000, 1),
        "decode_ms_per_token": round(t_decode * 1000 / D, 2),
    }))


if __name__ == "__main__":
    main()
