"""UniGR train-step throughput on one TPU chip.

The reference trains 7B with LoRA on 16x H800-80GB (ref run_torchrun.sh);
one v5e-1 (16 GB) fits a 3B-scale composite step: Qwen 3B (scan_layers +
remat, LoRA r8) + SAM2 Hiera-L at full 1024² SAM frames, bf16 params,
masked AdamW (frozen params get set_to_zero, so optimizer state is
LoRA/head-only). Prints JSON with samples/sec and step time.

  python scripts/bench_train.py --seq 512 --sam-frames 2
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
    p.add_argument("--size", choices=["tiny", "3b"], default="3b")
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--sam-frames", type=int, default=2)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument(
        "--no-freeze-backbone", action="store_true",
        help="A/B: backprop through the frozen SAM trunk (the pre-"
        "stop_gradient behavior)",
    )
    p.add_argument(
        "--vision", action="store_true",
        help="include video pixel tokens through the Qwen vision tower "
        "(the reference's real train workload: 320-merged-token video "
        "budget, ref run_torchrun.sh:19)",
    )
    p.add_argument(
        "--remat", choices=["full", "dots", "none"], default="full",
        help="LM activation strategy: full = recompute each layer in the "
        "backward (least HBM, ~4/3 fwd FLOPs); dots = save weight-matmul "
        "outputs, recompute only elementwise/norms "
        "(dots_with_no_batch_dims_saveable); none = store everything",
    )
    p.add_argument(
        "--fwd-only", action="store_true",
        help="time the loss forward alone (backward-share decomposition)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rga3_tpu.config import SegHeadConfig, TrainConfig
    from rga3_tpu.models.qwen25vl import QWEN25_VL_3B, tiny_config
    from rga3_tpu.models.sam2 import SAM2_HIERA_L, tiny_sam2_config
    from rga3_tpu.models.unigr import UniGR, UniGRConfig
    from rga3_tpu.train.step import build_train_step, make_train_state

    SEG = 151665
    if args.size == "3b":
        qcfg = QWEN25_VL_3B
        scfg = SAM2_HIERA_L
        out_dim = scfg.d_model
    else:
        qcfg = tiny_config(vocab_size=152_000)
        scfg = tiny_sam2_config(image_size=64).replace(d_model=32)
        out_dim = 32
    qcfg = qcfg.replace(
        text=qcfg.text.replace(
            lora_rank=8, lora_alpha=16.0, scan_layers=True
        )
    )
    cfg = UniGRConfig(
        qwen=qcfg, sam2=scfg,
        seg=SegHeadConfig(
            out_dim=out_dim, seg_token_id=SEG,
            ce_loss_weight=1.0, bce_loss_weight=2.0, dice_loss_weight=0.5,
            freeze_sam_backbone=not args.no_freeze_backbone,
        ),
    )
    model = UniGR(cfg, remat=args.remat)

    rng = np.random.default_rng(0)
    B, L, T = args.batch, args.seq, args.sam_frames
    S = scfg.image_size
    ids = rng.integers(0, 10_000, size=(B, L)).astype(np.int32)
    ids[:, L // 2] = SEG
    labels = ids.copy()
    labels[:, : L // 4] = -100

    patches = None
    layout_args = None
    n_patches = 0
    if args.vision:
        from rga3_tpu.models.qwen25vl.config import VIDEO_PAD_TOKEN_ID
        from rga3_tpu.models.qwen25vl.positions import get_rope_index
        from rga3_tpu.models.qwen25vl.vision import (
            compute_vision_layout, layout_device_args,
        )

        vcfg = qcfg.vision
        # 8 frames -> 4 temporal groups x 16x20 merged grid = 320 tokens
        grid = (4, 16, 20) if args.size != "tiny" else (1, 4, 4)
        grids = [grid] * B
        n_patches = B * grid[0] * grid[1] * grid[2]
        n_merged = (grid[0] * grid[1] * grid[2]) // vcfg.merge_unit
        layout_args = layout_device_args(
            compute_vision_layout(grids, vcfg), vcfg
        )
        vid_start = L // 4
        seg_pos = vid_start + n_merged  # first token AFTER the video span
        assert seg_pos < L - 1, "seq too short for the video budget"
        ids[:, L // 2] = 1  # drop the text-only [SEG] site (re-punched
        # below; if L//2 lands outside the video span it would otherwise
        # leave a second [SEG] in the sequence)
        ids[:, vid_start:seg_pos] = VIDEO_PAD_TOKEN_ID
        # [SEG] must sit outside the contiguous video span: a SEG inside
        # it would split the 320-token run (shifting every later vision
        # embedding by one cell and giving SEG a vision M-RoPE position)
        ids[:, seg_pos] = SEG
        labels = ids.copy()
        labels[:, : L // 4] = -100
        labels[:, vid_start:seg_pos] = -100  # vision tokens are never
        # CE targets (collate masks everything but assistant spans)
        pos, _ = get_rope_index(
            qcfg, ids, video_grid_thw=grids,
            second_per_grid_ts=[1.0] * B,
        )
        pos = np.asarray(pos)
        patches = jnp.asarray(
            rng.normal(
                size=(
                    n_patches,
                    3 * vcfg.temporal_patch_size * vcfg.patch_size ** 2,
                )
            ).astype(np.float32),
            jnp.bfloat16,
        )
    else:
        pos = np.broadcast_to(
            np.arange(L)[None, None], (3, B, L)
        ).astype(np.int32).copy()
    images_sam = jnp.asarray(
        rng.normal(size=(B, T, S, S, 3)).astype(np.float32), jnp.bfloat16
    )
    gt = jnp.asarray(
        (rng.random((B, T, S, S)) > 0.5).astype(np.float32), jnp.bfloat16
    )

    # init shapes without compiling; bf16 random params on device
    shapes = jax.eval_shape(
        lambda k: model.init(
            k,
            jnp.zeros((1, S, S, 3), jnp.bfloat16),
            jnp.zeros((1, 1, out_dim), jnp.bfloat16),
            jnp.asarray(ids[:1, :8]),
        ),
        jax.random.PRNGKey(0),
    )
    from flax.core import meta

    @jax.jit
    def make_params(k):
        return jax.tree.map(
            lambda s: (jax.random.normal(k, s.shape) * 0.02).astype(
                jnp.bfloat16
            ),
            meta.unbox(shapes),
        )

    t0 = time.time()
    params = make_params(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"# params ready in {time.time()-t0:.1f}s", file=sys.stderr)

    tcfg = TrainConfig(grad_accum_steps=1)
    state, tx = make_train_state(tcfg, params, mesh=None)

    vl_keys = tuple(layout_args) if args.vision else ()

    def loss_fn(p, batch):
        kw = {}
        if args.vision:
            kw = dict(
                pixel_patches=batch["pixel_patches"],
                vision_layout={k: batch["vl_" + k] for k in vl_keys},
            )
        return model.apply(
            p,
            batch["input_ids"], batch["labels"], batch["position_ids"],
            None, batch["images_sam"], batch["gt_masks"],
            jnp.ones((B,)),
            compute_dtype=jnp.bfloat16,
            method=UniGR.train_forward,
            **kw,
        )

    step = build_train_step(loss_fn, tx, grad_accum_steps=1)
    batch = {
        "input_ids": jnp.asarray(ids)[None],
        "labels": jnp.asarray(labels)[None],
        "position_ids": jnp.asarray(pos)[None],
        "images_sam": images_sam[None],
        "gt_masks": gt[None],
    }
    if args.vision:
        batch["pixel_patches"] = patches[None]
        for k, v in layout_args.items():
            batch["vl_" + k] = v[None]

    if args.fwd_only:
        fwd = jax.jit(
            lambda p, b: loss_fn(p, jax.tree.map(lambda v: v[0], b))["loss"]
        )
        t0 = time.time()
        fwd_c = fwd.lower(state.params, batch).compile()
        l0 = float(fwd_c(state.params, batch))
        print(
            f"# fwd compile {time.time()-t0:.1f}s loss={l0:.3f}",
            file=sys.stderr,
        )
        best = float("inf")
        for _ in range(max(args.steps, 5)):
            t0 = time.time()
            float(fwd_c(state.params, batch))
            best = min(best, time.time() - t0)
        print(json.dumps({
            "metric": "unigr_train_fwd_only",
            "size": args.size, "seq": L, "sam_frames": T,
            "remat": args.remat,
            "value": round(1000 * best, 1), "unit": "ms",
        }))
        return

    t0 = time.time()
    step_c = step.lower(state, batch).compile()
    # analytic model FLOPs — XLA cost_analysis counts 0 for Pallas
    # custom calls (flash attention, fused Hiera blocks), understating
    # MFU several-fold; see utils/flops.py + tests/test_flops.py
    from rga3_tpu.utils.flops import unigr_train_step_flops

    step_flops = unigr_train_step_flops(
        cfg, batch=B, seq=L, sam_frames=T, vision_patches=n_patches
    )
    state, aux = step_c(state, batch)
    loss0 = float(aux["loss"])
    print(
        f"# compile+first step {time.time()-t0:.1f}s loss={loss0:.3f}",
        file=sys.stderr,
    )

    best = 0.0
    for _ in range(args.steps):
        t0 = time.time()
        state, aux = step_c(state, batch)
        float(aux["loss"])  # host fetch forces completion
        best = max(best, B / (time.time() - t0))

    from rga3_tpu.utils.profiling import mfu

    print(json.dumps({
        "metric": "unigr_train_step_throughput",
        "size": args.size,
        "remat": args.remat,
        "seq": L,
        "sam_frames": T,
        "vision_patches": n_patches,
        "value": round(best, 3),
        "unit": "samples/sec/chip",
        "step_ms": round(1000 * B / best, 1),
        "mfu": round(mfu(step_flops, B / best), 4) if best else 0.0,
    }))


if __name__ == "__main__":
    main()
