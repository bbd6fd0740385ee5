"""Per-leg forward timing of the train step's three compute towers.

Round-3 decomposition: the 3B LM prefill measured MFU 0.71 on-device
(bench_lm_prefill), yet the composite train forward is 119.7 ms — so
the drag is NOT the LM. This probe times each leg in isolation with
device_timeit (params passed as arguments):

  vision   Qwen ViT at the release video budget (grid (4,16,20) x B)
  trunk    SAM2 Hiera-L 1024^2 trunk+neck forward (B*T frames)
  lm       QwenLM fwd at (B, 512) for the cross-check sum

  python scripts/bench_fwd_legs.py --batch 1 --sam-frames 2
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
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--sam-frames", type=int, default=2)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--skip", default="",
                   help="comma list of legs to skip (vision,trunk,lm)")
    args = p.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import meta

    from rga3_tpu.models.qwen25vl import QWEN25_VL_3B
    from rga3_tpu.utils import flops as F
    from rga3_tpu.utils.profiling import device_timeit, mfu

    results = {"batch": args.batch, "sam_frames": args.sam_frames}
    rng = np.random.default_rng(0)
    B = args.batch

    def rand_params(shapes, key):
        @jax.jit
        def mk(k):
            return jax.tree.map(
                lambda s: (jax.random.normal(k, s.shape) * 0.02).astype(
                    jnp.bfloat16
                ),
                meta.unbox(shapes),
            )

        out = mk(key)
        jax.block_until_ready(out)
        return out

    # ---- vision tower ------------------------------------------------
    if "vision" not in skip:
        from rga3_tpu.models.qwen25vl.vision import (
            QwenVisionTower, compute_vision_layout, layout_device_args,
        )

        vcfg = QWEN25_VL_3B.vision
        if os.environ.get("RGA3_VIT_RESIDENT"):  # A/B window-resident mode
            vcfg = vcfg.replace(window_resident=True)
        grid = (4, 16, 20)
        grids = [grid] * B
        n_patches = B * grid[0] * grid[1] * grid[2]
        la = layout_device_args(compute_vision_layout(grids, vcfg), vcfg)
        patches = jnp.asarray(
            rng.normal(size=(
                n_patches, 3 * vcfg.temporal_patch_size
                * vcfg.patch_size ** 2,
            )).astype(np.float32), jnp.bfloat16,
        )
        tower = QwenVisionTower(vcfg)
        vshapes = jax.eval_shape(
            lambda k: tower.init(
                k, patches, compute_dtype=jnp.bfloat16, **la
            ),
            jax.random.PRNGKey(0),
        )
        vparams = rand_params(vshapes, jax.random.PRNGKey(1))

        def run_vision(p_, x):
            return tower.apply(p_, x, compute_dtype=jnp.bfloat16, **la)

        ms = device_timeit(
            run_vision, vparams, patches, iters=args.iters,
            perturb=lambda a, i: (a[0], a[1] + i.astype(a[1].dtype)),
        )
        fl = F.qwen_vision_flops(vcfg, n_patches)
        results["vision_ms"] = round(ms, 2)
        results["vision_mfu"] = round(mfu(fl, ms / 1e3), 4)

    # ---- SAM2 trunk + neck -------------------------------------------
    if "trunk" not in skip:
        from rga3_tpu.models.sam2 import SAM2_HIERA_L
        from rga3_tpu.models.sam2.model import Sam2Model

        scfg = SAM2_HIERA_L
        model = Sam2Model(scfg)
        frames = jnp.asarray(
            rng.normal(size=(
                B * args.sam_frames, scfg.image_size, scfg.image_size, 3
            )).astype(np.float32), jnp.bfloat16,
        )
        lang = jnp.asarray(
            rng.normal(size=(1, 1, scfg.d_model)).astype(np.float32),
            jnp.bfloat16,
        )
        sshapes = jax.eval_shape(
            lambda k: model.init(k, frames[:1], lang),
            jax.random.PRNGKey(0),
        )
        sparams = rand_params(sshapes, jax.random.PRNGKey(2))

        def run_trunk(p_, x):
            feats = model.apply(p_, x, method=Sam2Model.forward_image)
            return feats["backbone_fpn"][-1]

        ms = device_timeit(
            run_trunk, sparams, frames, iters=args.iters,
            perturb=lambda a, i: (a[0], a[1] + i.astype(a[1].dtype)),
        )
        fl = B * args.sam_frames * (
            F.hiera_flops(scfg.hiera, scfg.image_size)
            + F.sam2_neck_flops(scfg, scfg.image_size)
        )
        results["trunk_ms"] = round(ms, 2)
        results["trunk_mfu"] = round(mfu(fl, ms / 1e3), 4)

    # ---- LM (cross-check; bench_lm_prefill measures this in depth) ----
    if "lm" not in skip:
        from rga3_tpu.models.qwen25vl.language import QwenForCausalLM

        tcfg = QWEN25_VL_3B.text.replace(
            lora_rank=8, lora_alpha=16.0, scan_layers=True
        )
        lm = QwenForCausalLM(tcfg)
        ids = jnp.asarray(
            rng.integers(0, 10_000, size=(B, args.seq)), jnp.int32
        )
        pos = jnp.broadcast_to(
            jnp.arange(args.seq)[None, None], (3, B, args.seq)
        )
        lshapes = jax.eval_shape(
            lambda k: lm.init(
                k, input_ids=ids[:, :8], position_ids=pos[:, :, :8]
            ),
            jax.random.PRNGKey(0),
        )
        lparams = rand_params(lshapes, jax.random.PRNGKey(3))

        def run_lm(p_, ids_):
            return lm.apply(
                p_, input_ids=ids_, position_ids=pos,
                compute_dtype=jnp.bfloat16,
            )["logits"]

        ms = device_timeit(
            run_lm, lparams, ids, iters=args.iters,
            perturb=lambda a, i: (a[0], (a[1] + i.astype(jnp.int32))
                                  % 900),
        )
        fl = F.qwen_lm_flops(tcfg, B * args.seq)
        results["lm_ms"] = round(ms, 2)
        results["lm_mfu"] = round(mfu(fl, ms / 1e3), 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
