"""Speculative-decode throughput bounds on random weights.

With random weights a real draft accepts ~0 proposals (worst case: every
verify emits 1 token — measures the overhead floor), while --self_draft
accepts everything (best case: k+1 tokens per verify — the acceptance-
rate ceiling). Real speedup with trained checkpoints lands between the
two at the model pair's acceptance rate.

  python scripts/bench_spec.py --target 7b --draft 3b --k 4 [--int4]
  python scripts/bench_spec.py --target 7b --self_draft --k 4
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
    p.add_argument("--target", choices=["tiny", "3b", "7b"], default="7b")
    p.add_argument("--draft", choices=["tiny", "3b"], default="3b")
    p.add_argument("--self_draft", action="store_true",
                   help="draft == target: full acceptance (upper bound)")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--prefill", type=int, default=256)
    p.add_argument("--decode", type=int, default=64)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int4", action="store_true",
                   help="int4 LM — HBM-CAPACITY ONLY on v5e: measured SLOWER than --int8 (7B 49.9 vs 92.6 tok/s with the partial-dot-scaled kernel; ~= bf16 speed at 3.6x less HBM)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rga3_tpu.models.qwen25vl import (
        QWEN25_VL_3B, QWEN25_VL_7B, tiny_config,
    )
    from rga3_tpu.models.qwen25vl.generate import (
        greedy_generate, speculative_greedy_generate,
    )
    from rga3_tpu.models.qwen25vl.model import Qwen25VL
    from rga3_tpu.models.qwen25vl.positions import get_rope_index

    presets = {"tiny": tiny_config(), "3b": QWEN25_VL_3B,
               "7b": QWEN25_VL_7B}

    def build(size):
        cfg = presets[size]
        cfg = cfg.replace(text=cfg.text.replace(
            scan_layers=True, quant_int8=args.int8, quant_int4=args.int4,
        ))
        model = Qwen25VL(cfg)
        init_cfg = cfg.replace(text=cfg.text.replace(
            quant_int8=False, quant_int4=False))
        rng = np.random.default_rng(0)
        ids = jnp.asarray(
            rng.integers(0, 100_000, (1, args.prefill)), jnp.int32
        )
        shapes = jax.eval_shape(
            lambda k: Qwen25VL(init_cfg).init(k, input_ids=ids),
            jax.random.PRNGKey(0),
        )

        def make(k):
            from flax.core import meta

            if args.int8 or args.int4:
                # leaf-wise generate+quantize (whole-tree jit OOMs at 7B)
                from rga3_tpu.ops.quant import random_quantized_params

                return {"params": random_quantized_params(
                    meta.unbox(shapes)["params"],
                    bits=4 if args.int4 else 8)}
            gen = jax.jit(lambda kk: jax.tree.map(
                lambda s: (jax.random.normal(kk, s.shape) * 0.02).astype(
                    jnp.bfloat16),
                meta.unbox(shapes),
            ))
            return gen(k)

        params = make(jax.random.PRNGKey(1))
        jax.block_until_ready(params)
        return model, params, ids

    model, params, ids = build(args.target)
    if args.self_draft:
        draft_model, draft_params = model, params
    else:
        draft_model, draft_params, _ = build(args.draft)

    pos, deltas = get_rope_index(model.cfg, np.asarray(ids))
    kw = dict(
        input_ids=ids,
        attention_mask=jnp.ones_like(ids),
        position_ids=jnp.asarray(pos),
        rope_deltas=jnp.asarray(deltas),
        max_new_tokens=args.decode,
        eos_token_id=2**30,  # never stops: measure the full budget
        pad_token_id=0,
    )

    t0 = time.time()
    np.asarray(greedy_generate(model, params, **kw))
    print(f"# plain compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    np.asarray(greedy_generate(model, params, **kw))
    t_plain = time.time() - t0

    t0 = time.time()
    _, stats = speculative_greedy_generate(
        model, params, draft_model, draft_params, k=args.k, **kw)
    print(f"# spec compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    _, stats = speculative_greedy_generate(
        model, params, draft_model, draft_params, k=args.k, **kw)
    t_spec = time.time() - t0

    print(json.dumps({
        "metric": "speculative_decode",
        "target": args.target,
        "draft": "self" if args.self_draft else args.draft,
        "k": args.k,
        "quant": "int4" if args.int4 else ("int8" if args.int8 else "bf16"),
        "plain_tok_per_sec": round(args.decode / t_plain, 1),
        "spec_tok_per_sec": round(stats["emitted"] / t_spec, 1),
        "speedup": round(t_plain / t_spec * stats["emitted"]
                         / args.decode, 3),
        "verify_steps": stats["steps"],
    }))


if __name__ == "__main__":
    main()
