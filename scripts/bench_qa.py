"""Full referring-QA pipeline throughput on one TPU chip: vision tower +
prefill + KV-cached greedy decode — the VideoInfer serving workload
(ref inference_videoinfer.py:277-321; BASELINE north star is per-chip
VideoInfer throughput).

Synthesizes the release video budget (8 frames at <=320*28*28 px ->
320 merged video tokens, ref run_torchrun.sh:19) and measures end-to-end
samples/sec for 64 new tokens.

  python scripts/bench_qa.py --size 7b --int8
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
    p.add_argument("--decode", type=int, default=64)
    p.add_argument("--text-tokens", type=int, default=64)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int4", action="store_true",
                   help="int4 weight-only LM + int8 vision tower — HBM-CAPACITY ONLY on v5e: measured SLOWER than --int8 (7B 49.9 vs 92.6 tok/s with the partial-dot-scaled kernel; ~= bf16 speed at 3.6x less HBM)")
    p.add_argument("--kv-int8", dest="kv_int8", action="store_true",
                   help="int8 KV cache (halves the cache's share of "
                   "decode HBM traffic)")
    p.add_argument("--w8a8", action="store_true",
                   help="W8A8 prefill/vision (int8 MXU dots at 2x bf16 "
                   "FLOP rate; decode stays weight-only). Requires "
                   "--int8.")
    p.add_argument("--samples", type=int, default=5)
    p.add_argument("--batch", type=int, default=1,
                   help="samples per batched prefill+decode (the\n"
                   "answer_batch eval path; decode is weight-bound\n"
                   "so samples/sec scales with batch)")
    p.add_argument("--stom", choices=["none", "lk", "cotracker3",
                                      "shipped"],
                   default="none",
                   help="BASELINE config 5: add STOM visual-prompt "
                   "propagation per sample (ref inference_videoinfer.py"
                   ":199,259-270 --use_stom; cotracker3 = the official "
                   "scaled_offline architecture, jitted, random weights; "
                   "shipped = the in-repo trained CoTracker3-small "
                   "weights — what STOM() actually defaults to)")
    p.add_argument("--stom-bf16", dest="stom_bf16", action="store_true",
                   help="CoTracker3 compute_dtype=bfloat16 (params stay "
                   "f32; norms/softmax/coords f32) — the tracker is 80%% "
                   "of the config-5 pipeline")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rga3_tpu.models.qwen25vl import (
        QWEN25_VL_3B, QWEN25_VL_7B, tiny_config,
    )
    from rga3_tpu.models.qwen25vl.config import VIDEO_PAD_TOKEN_ID
    from rga3_tpu.models.qwen25vl.generate import greedy_generate
    from rga3_tpu.models.qwen25vl.model import Qwen25VL
    from rga3_tpu.models.qwen25vl.positions import get_rope_index
    from rga3_tpu.models.qwen25vl.vision import (
        compute_vision_layout, layout_device_args,
    )

    qcfg = {
        "tiny": tiny_config(), "3b": QWEN25_VL_3B, "7b": QWEN25_VL_7B,
    }[args.size]
    assert not (args.int8 and args.int4), "--int8 and --int4 are exclusive"
    if args.w8a8:
        assert args.int8, "--w8a8 requires --int8"
    qcfg = qcfg.replace(
        text=qcfg.text.replace(
            scan_layers=True, quant_int8=args.int8, quant_int4=args.int4,
            kv_cache_int8=args.kv_int8, quant_w8a8=args.w8a8,
        ),
        vision=qcfg.vision.replace(
            scan_blocks=True, quant_int8=args.int8 or args.int4,
            quant_w8a8=args.w8a8,
        ),
    )
    model = Qwen25VL(qcfg)
    vcfg = qcfg.vision

    # 8 frames -> 4 temporal groups x 16x20 patch grid = 320 merged tokens
    grid = (4, 16, 20) if args.size != "tiny" else (1, 4, 4)
    B = args.batch
    grids = [grid] * B
    n_patches = grid[0] * grid[1] * grid[2]
    n_merged = n_patches // vcfg.merge_unit
    layout = compute_vision_layout(grids, vcfg)
    la = layout_device_args(layout, vcfg)

    rng = np.random.default_rng(0)
    L = args.text_tokens + n_merged
    ids = rng.integers(1000, 30_000, size=(B, L)).astype(np.int32)
    vid_start = args.text_tokens // 2
    ids[:, vid_start : vid_start + n_merged] = VIDEO_PAD_TOKEN_ID
    pos, deltas = get_rope_index(
        qcfg, ids, video_grid_thw=grids,
        second_per_grid_ts=[1.0] * B,
    )
    patches = jnp.asarray(
        rng.normal(
            size=(
                B * n_patches,
                3 * vcfg.temporal_patch_size * vcfg.patch_size**2,
            )
        ).astype(np.float32),
        jnp.bfloat16,
    )

    # random bf16 params on device; int8 tree transform afterwards
    init_cfg = qcfg.replace(
        text=qcfg.text.replace(quant_int8=False, quant_int4=False),
        vision=qcfg.vision.replace(quant_int8=False),
    )
    init_model = Qwen25VL(init_cfg)
    shapes = jax.eval_shape(
        lambda k: init_model.init(
            k, input_ids=ids, pixel_patches=patches, vision_layout=la
        ),
        jax.random.PRNGKey(0),
    )
    from flax.core import meta

    def make_params(k):
        if args.int4 or args.int8:
            # leaf-wise generate+quantize: a single whole-tree jit peaks
            # at fp + quantized + temps, which OOMs 7B on a 16G chip
            from rga3_tpu.ops.quant import random_serving_params

            return {
                "params": random_serving_params(
                    meta.unbox(shapes)["params"],
                    "int4" if args.int4 else "int8",
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
    params = make_params(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"# params ready in {time.time()-t0:.1f}s", file=sys.stderr)

    def run():
        return greedy_generate(
            model, params,
            jnp.asarray(ids), jnp.ones((B, L), jnp.int32),
            jnp.asarray(pos), jnp.asarray(deltas),
            max_new_tokens=args.decode,
            eos_token_id=-1,  # never stop early (throughput measurement)
            pad_token_id=151643,
            pixel_patches=patches,
            vision_layout=la,
            compute_dtype=jnp.bfloat16,
        )

    t0 = time.time()
    np.asarray(run())
    print(f"# compile+first {time.time()-t0:.1f}s", file=sys.stderr)

    best = 0.0
    K = 3  # async back-to-back dispatches, one fetch: amortizes the
    # relay's ~32 ms scalar round-trip out of the per-sample time
    for _ in range(args.samples):
        t0 = time.time()
        acc = None
        for _i in range(K):
            toks = run()
            acc = toks if acc is None else acc + toks
        np.asarray(acc)
        best = max(best, (K * B) / (time.time() - t0))

    # serving-honest variant: ship the batch's UINT8 patches per call
    # (the processor's ship_uint8 default; CLIP-normalize runs on
    # device, bit-identical) — what the eval driver actually pays per
    # batch, vs the staged-patches number above which measures device
    # compute only
    patches_u8_host = rng.integers(
        0, 256,
        size=(B * n_patches, 3 * vcfg.temporal_patch_size
              * vcfg.patch_size**2),
    ).astype(np.uint8)

    def run_upload():
        return greedy_generate(
            model, params,
            jnp.asarray(ids), jnp.ones((B, L), jnp.int32),
            jnp.asarray(pos), jnp.asarray(deltas),
            max_new_tokens=args.decode,
            eos_token_id=-1,
            pad_token_id=151643,
            pixel_patches=jnp.asarray(patches_u8_host),
            vision_layout=la,
            compute_dtype=jnp.bfloat16,
        )

    t0 = time.time()
    np.asarray(run_upload())
    print(f"# u8-upload compile+first {time.time()-t0:.1f}s",
          file=sys.stderr)
    best_upload = 0.0
    for _ in range(args.samples):
        t0 = time.time()
        acc = None
        for _i in range(K):
            toks = run_upload()
            acc = toks if acc is None else acc + toks
        np.asarray(acc)
        best_upload = max(best_upload, (K * B) / (time.time() - t0))

    stom_info = None
    if args.stom != "none":
        # config-5 leg: per QA sample the key-frame overlay is propagated
        # to every frame before the MLLM sees the video (the eval path in
        # evaluation/region_qa_eval.py / videoinfer_eval.py)
        from rga3_tpu.models.stom import STOM

        if args.stom == "cotracker3":
            from rga3_tpu.models.stom.cotracker3 import (
                CoTracker3Offline, CoTracker3Predictor,
                cotracker3_offline_config,
            )

            ccfg = cotracker3_offline_config()
            if args.stom_bf16:
                import dataclasses

                ccfg = dataclasses.replace(
                    ccfg, compute_dtype="bfloat16"
                )
            cmodel = CoTracker3Offline(ccfg)
            cshapes = jax.eval_shape(
                cmodel.init, jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct((8, 480, 854, 3), jnp.float32),
                jax.ShapeDtypeStruct((256, 3), jnp.float32),
            )
            kgen = jax.jit(lambda k: jax.tree.map(
                lambda s: (jax.random.normal(k, s.shape) * 0.02).astype(
                    s.dtype
                ),
                cshapes,
            ))
            cparams = kgen(jax.random.PRNGKey(1))
            jax.block_until_ready(cparams)
            stom = STOM(tracker=CoTracker3Predictor(cparams, cmodel))
        elif args.stom == "shipped":
            from rga3_tpu.models.stom.cotracker3 import shipped_tracker

            tracker = shipped_tracker()
            assert tracker is not None, (
                "--stom shipped needs the in-repo trained weights "
                "(rga3_tpu/models/stom/weights/cotracker3_small.npz)"
            )
            stom = STOM(tracker=tracker)
        else:
            from rga3_tpu.models.stom.tracker import LKTracker

            stom = STOM(tracker=LKTracker())

        # 8-frame 480x854 clip with a moving bright square; red ellipse
        # overlay (RGBA) around it on the key frame
        frames_np = []
        for i in range(8):
            f = rng.integers(0, 90, (480, 854, 3)).astype(np.uint8)
            f[140 + 12 * i:240 + 12 * i, 200 + 30 * i:320 + 30 * i] = 220
            frames_np.append(f)
        import cv2

        vip = np.zeros((480, 854, 4), np.uint8)
        cv2.ellipse(vip, (260, 190), (90, 80), 0, 0, 360,
                    (255, 0, 0, 255), 6)

        # ndarray frames in/out — the eval drivers' actual calling
        # convention (videoinfer_eval.prepare decodes to numpy). With
        # --batch > 1 the eval driver propagates the batch's overlays in
        # ONE tracker dispatch (propagate_in_video_batch), so bench the
        # same shape.
        stom_batch = [
            {
                "frames": [np.clip(f.astype(np.int16) + b, 0, 255)
                           .astype(np.uint8) for f in frames_np],
                "vip": vip,
                "key_idx": 0,
                "shape": "ellipse",
            }
            for b in range(args.batch)
        ]
        t0 = time.time()
        stom.propagate_in_video_batch(stom_batch)
        print(f"# stom compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        best_stom = float("inf")
        for _ in range(args.samples):
            t0 = time.time()
            stom.propagate_in_video_batch(stom_batch)
            best_stom = min(best_stom, time.time() - t0)
        # cost split (VERDICT r3 item 3): tracker dispatch alone vs the
        # full propagate (the remainder = host query-mask build + numpy
        # window compositing)
        track_ms = None
        if hasattr(stom.tracker, "track_batch"):
            arrs = [
                [np.ascontiguousarray(f[..., :3]) for f in s["frames"]]
                for s in stom_batch
            ]
            masks = [stom._query_mask(s["vip"]) for s in stom_batch]
            idxs = [s["key_idx"] for s in stom_batch]
            stom.tracker.track_batch(arrs, masks, idxs)  # warm
            best_tr = float("inf")
            for _ in range(args.samples):
                t0 = time.time()
                stom.tracker.track_batch(arrs, masks, idxs)
                best_tr = min(best_tr, time.time() - t0)
            track_ms = 1000.0 * best_tr / args.batch
        qa_ms = 1000.0 / best  # per sample, batch amortized
        stom_ms = 1000.0 * best_stom / args.batch
        # pipelined steady state — what the eval driver actually runs
        # (videoinfer_eval.run_inference): STOM for batch k+1 on a
        # worker thread WHILE the chat decodes batch k. The tracker leg
        # is relay-transfer-bound and the decode leaves the link idle,
        # so the pipeline rate approaches max(stom, qa) not their sum.
        from concurrent.futures import ThreadPoolExecutor

        n_pipe = max(args.samples, 4)
        with ThreadPoolExecutor(max_workers=1) as ex:
            t0 = time.time()
            fut = ex.submit(stom.propagate_in_video_batch, stom_batch)
            for k in range(n_pipe):
                fut.result()
                if k + 1 < n_pipe:
                    fut = ex.submit(
                        stom.propagate_in_video_batch, stom_batch
                    )
                # serving-honest: the decode leg pays the per-batch u8
                # patch upload, exactly as the eval driver does
                np.asarray(run_upload())
            pipe_ms = 1000.0 * (time.time() - t0) / (n_pipe * args.batch)
        stom_info = {
            "backend": args.stom,
            "batched": args.batch,
            "ms_per_sample": round(stom_ms, 1),
            "tracker_ms_per_sample": (
                round(track_ms, 1) if track_ms is not None else None
            ),
            "host_compose_ms_per_sample": (
                round(stom_ms - track_ms, 1)
                if track_ms is not None else None
            ),
            "qa_ms_per_sample": round(qa_ms, 1),
            "share_of_pipeline": round(stom_ms / (stom_ms + qa_ms), 4),
            "serial_ms_per_sample": round(stom_ms + qa_ms, 1),
            "pipelined_ms_per_sample": round(pipe_ms, 1),
        }

    # Analytic model FLOPs (the pipeline spans several jitted fns, so XLA
    # cost analysis of one compiled graph can't cover it): 2*P per token —
    # vision params see n_patches tokens, LM params see prefill + decode.
    # int8 dequantizes to the same math FLOPs.
    def subtree_size(t):
        import jax as _jax

        return sum(int(x.size) for x in _jax.tree.leaves(t))

    pv = subtree_size(params["params"].get("visual", {}))
    pt = subtree_size(params["params"]) - pv
    flops = B * (2.0 * pv * n_patches + 2.0 * pt * (L + args.decode))
    from rga3_tpu.utils.profiling import mfu

    print(json.dumps({
        "metric": (
            "videoinfer_qa_pipeline_throughput" if stom_info is None
            else "videoinfer_qa_stom_pipeline_throughput"
        ),
        "stom": stom_info,
        "size": args.size,
        "batch": args.batch,
        "int8": args.int8,
        "int4": args.int4,
        "video_tokens": n_merged,
        "new_tokens": args.decode,
        # the headline IS the serving-honest number: per-batch uint8
        # patch upload included (what a deployment pays — upload bytes =
        # B * n_patches * 1176). With --stom it's the measured pipelined
        # rate (STOM of batch k+1 overlapped with the u8-upload decode of
        # batch k, as the eval driver runs it); mfu stays QA-only (the
        # tracker's FLOPs aren't counted)
        "value": round(
            best_upload if stom_info is None
            else 1000.0 / stom_info["pipelined_ms_per_sample"], 3,
        ),
        "unit": "samples/sec/chip",
        "ms_per_sample": round(
            1000.0 / best_upload if stom_info is None
            else stom_info["pipelined_ms_per_sample"], 1,
        ),
        # device-compute-only rate on pre-staged patches (upper bound;
        # NOT the serving number)
        "staged_compute_samples_per_sec": round(best, 3),
        "staged_compute_ms_per_sample": round(1000.0 / best, 1)
        if best else None,
        "mfu": round(mfu(flops, B / best_upload), 4)
        if best_upload else 0.0,
    }))


if __name__ == "__main__":
    main()
