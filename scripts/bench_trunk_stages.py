"""Per-stage device timing of the SAM2 Hiera-L trunk (VERDICT r3 item 8).

The trunk leg measured 39.7 ms / MFU 0.465 at micro-bs 1 x 2 frames
(bench_fwd_legs) — the second-weakest leg after the ViT. This probe
splits that wall time by stage: it times prefix trunks truncated at each
stage boundary (Hiera.__call__'s `num_blocks`) with device_timeit and
differences them, next to each stage's analytic FLOPs, so the MFU drag
is attributable to a specific stage before attempting a kernel change.

  python scripts/bench_trunk_stages.py --frames 2
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def stage_flops(hcfg, image_size: int):
    """Per-block FLOPs mirroring utils/flops.hiera_flops, bucketed by
    stage (embed counted into stage 1)."""
    from rga3_tpu.utils.flops import attention, conv2d, dense

    s = image_size // hcfg.patch_stride
    buckets = [0.0] * len(hcfg.stages)
    buckets[0] += conv2d(s, s, hcfg.patch_kernel, hcfg.patch_kernel,
                         3, hcfg.embed_dim)
    stage_ends = hcfg.stage_ends
    q_pool_blocks = set(hcfg.q_pool_blocks)
    dim = hcfg.embed_dim
    cur_stage = 1
    for i in range(hcfg.depth):
        dim_out = dim
        window = hcfg.window_spec[cur_stage - 1]
        if i in hcfg.global_att_blocks:
            window = 0
        if i - 1 in stage_ends:
            dim_out = int(dim * hcfg.dim_mul)
            cur_stage += 1
        tokens_in = s * s
        if i in q_pool_blocks:
            s = s // hcfg.q_stride[0]
        tokens_out = s * s
        fl = dense(tokens_in, dim, 3 * dim_out)
        if dim != dim_out:
            fl += dense(tokens_in, dim, dim_out)
        lk = window * window if window else tokens_in
        lq = lk * tokens_out // tokens_in if window else tokens_out
        fl += (tokens_in // lk) * attention(lq, lk, dim_out)
        fl += dense(tokens_out, dim_out, dim_out)  # attn proj
        hidden = int(dim_out * hcfg.mlp_ratio)
        fl += dense(tokens_out, dim_out, hidden)
        fl += dense(tokens_out, hidden, dim_out)
        buckets[cur_stage - 1] += fl
        dim = dim_out
    return buckets


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import meta

    from rga3_tpu.models.sam2 import SAM2_HIERA_L
    from rga3_tpu.models.sam2.hiera import Hiera
    from rga3_tpu.utils.profiling import device_timeit, mfu

    scfg = SAM2_HIERA_L
    hcfg = scfg.hiera
    trunk = Hiera(hcfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(args.frames, scfg.image_size, scfg.image_size, 3))
        .astype(np.float32), jnp.bfloat16,
    )
    shapes = jax.eval_shape(
        lambda k: trunk.init(k, frames[:1]), jax.random.PRNGKey(0)
    )

    @jax.jit
    def mk(k):
        return jax.tree.map(
            lambda s: (jax.random.normal(k, s.shape) * 0.02).astype(
                jnp.bfloat16
            ),
            meta.unbox(shapes),
        )

    params = mk(jax.random.PRNGKey(1))
    jax.block_until_ready(params)

    # prefix boundaries: embed-only, then each stage end (inclusive)
    cuts = [0] + [e + 1 for e in hcfg.stage_ends]
    names = ["embed"] + [f"stage{i+1}" for i in range(len(hcfg.stages))]
    cum = []
    for nb in cuts:
        def run(p_, x, nb=nb):
            return trunk.apply(p_, x, num_blocks=nb)[-1]

        ms = device_timeit(
            run, params, frames, iters=args.iters,
            perturb=lambda a, i: (a[0], a[1] + i.astype(a[1].dtype)),
        )
        cum.append(ms)
        print(f"prefix {names[len(cum)-1]:7s} (blocks<{nb:2d}): "
              f"{ms:7.2f} ms cumulative", flush=True)

    fl = stage_flops(hcfg, scfg.image_size)
    out = {"frames": args.frames, "total_ms": round(cum[-1], 2)}
    prev = cum[0]
    out["embed_ms"] = round(cum[0], 2)
    for i in range(len(hcfg.stages)):
        dt = cum[i + 1] - prev
        prev = cum[i + 1]
        stage_fl = fl[i] * args.frames
        out[f"stage{i+1}_ms"] = round(dt, 2)
        out[f"stage{i+1}_mfu"] = round(mfu(stage_fl, dt / 1e3), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
