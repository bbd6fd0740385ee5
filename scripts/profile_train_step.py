"""Capture a jax.profiler trace of the composite train forward and print
the top HLO ops by self-time (xprof hlo_stats) — closes the ~32 ms gap
between the sum of per-leg times (bench_fwd_legs: vision 24.1 + trunk
39.7 + lm 23.6 = 87.5 ms) and the measured composite forward (119.7 ms).

  python scripts/profile_train_step.py --steps 3 --top 25
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def build_fwd(args):
    """Same workload as bench_train --vision --fwd-only (3B, seq 512,
    2 SAM frames, 320-token video budget)."""
    import subprocess

    # reuse bench_train's builder by importing it is messy (argparse in
    # main); rebuild the minimal fwd here
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import meta

    from rga3_tpu.config import SegHeadConfig
    from rga3_tpu.models.qwen25vl import QWEN25_VL_3B
    from rga3_tpu.models.qwen25vl.config import VIDEO_PAD_TOKEN_ID
    from rga3_tpu.models.qwen25vl.positions import get_rope_index
    from rga3_tpu.models.qwen25vl.vision import (
        compute_vision_layout, layout_device_args,
    )
    from rga3_tpu.models.sam2 import SAM2_HIERA_L
    from rga3_tpu.models.unigr import UniGR, UniGRConfig

    SEG = 151665
    qcfg = QWEN25_VL_3B.replace(
        text=QWEN25_VL_3B.text.replace(
            lora_rank=8, lora_alpha=16.0, scan_layers=True
        )
    )
    scfg = SAM2_HIERA_L
    cfg = UniGRConfig(
        qwen=qcfg, sam2=scfg,
        seg=SegHeadConfig(out_dim=scfg.d_model, seg_token_id=SEG),
    )
    model = UniGR(cfg, remat="none")
    rng = np.random.default_rng(0)
    B, L, T, S = args.batch, 512, 2, scfg.image_size
    ids = rng.integers(0, 10_000, size=(B, L)).astype(np.int32)
    vcfg = qcfg.vision
    grid = (4, 16, 20)
    grids = [grid] * B
    n_patches = B * grid[0] * grid[1] * grid[2]
    n_merged = (grid[0] * grid[1] * grid[2]) // vcfg.merge_unit
    la = layout_device_args(compute_vision_layout(grids, vcfg), vcfg)
    vid_start = L // 4
    seg_pos = vid_start + n_merged
    ids[:, vid_start:seg_pos] = VIDEO_PAD_TOKEN_ID
    ids[:, seg_pos] = SEG
    labels = ids.copy()
    labels[:, : L // 4] = -100
    labels[:, vid_start:seg_pos] = -100
    pos, _ = get_rope_index(
        qcfg, ids, video_grid_thw=grids, second_per_grid_ts=[1.0] * B
    )
    patches = jnp.asarray(
        rng.normal(size=(
            n_patches, 3 * vcfg.temporal_patch_size * vcfg.patch_size ** 2
        )).astype(np.float32), jnp.bfloat16,
    )
    images_sam = jnp.asarray(
        rng.normal(size=(B, T, S, S, 3)).astype(np.float32), jnp.bfloat16
    )
    gt = jnp.asarray(
        (rng.random((B, T, S, S)) > 0.5).astype(np.float32), jnp.bfloat16
    )
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, S, S, 3), jnp.bfloat16),
            jnp.zeros((1, 1, scfg.d_model), jnp.bfloat16),
            jnp.asarray(ids[:1, :8]),
        ),
        jax.random.PRNGKey(0),
    )

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

    @jax.jit
    def fwd(p, ids_, labels_, pos_, img, gt_, pp):
        out = model.apply(
            p, ids_, labels_, pos_, None, img, gt_,
            jnp.ones((B,)), pixel_patches=pp, vision_layout=la,
            compute_dtype=jnp.bfloat16, method=UniGR.train_forward,
        )
        return out["loss"]

    argv = (params, jnp.asarray(ids), jnp.asarray(labels),
            jnp.asarray(np.asarray(pos)), images_sam, gt, patches)
    return fwd, argv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--logdir", default="/tmp/rga3_profile")
    args = p.parse_args()

    import numpy as np

    import jax

    fwd, argv = build_fwd(args)
    loss = float(np.asarray(fwd(*argv)))  # compile + warm
    print(f"# warm loss={loss:.3f}", file=sys.stderr)

    import shutil

    shutil.rmtree(args.logdir, ignore_errors=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            out = fwd(*argv)
        float(np.asarray(out))

    xplanes = glob.glob(
        os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        print(json.dumps({"error": "no xplane captured",
                          "logdir": args.logdir}))
        return 1
    print(f"# xplane: {xplanes[0]}", file=sys.stderr)

    try:
        from xprof.convert import raw_to_tool_data  # protobuf-5 capable
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    obj = json.loads(data)
    # hlo_stats: {"p": cols meta..., "rows"/"data": [...]} — formats vary
    # across plugin versions; dump the head raw if parsing fails
    rows = obj if isinstance(obj, list) else obj.get("data", obj)
    try:
        header, body = rows[0], rows[1:]
        i_time = next(
            i for i, c in enumerate(header)
            if "self" in str(c).lower() and "time" in str(c).lower()
        )
        i_name = next(
            i for i, c in enumerate(header)
            if "category" in str(c).lower() or "name" in str(c).lower()
        )
        agg = {}
        for r in body:
            agg[r[i_name]] = agg.get(r[i_name], 0.0) + float(r[i_time])
        top = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
        total = sum(agg.values())
        print(json.dumps({
            "total_self_time": total,
            "top": [
                {"op": k, "t": round(v, 1),
                 "pct": round(100 * v / total, 1)}
                for k, v in top
            ],
        }, indent=1))
    except Exception as e:
        print(f"# raw parse fallback ({e})", file=sys.stderr)
        print(str(rows)[:4000])
    return 0


if __name__ == "__main__":
    sys.exit(main())
