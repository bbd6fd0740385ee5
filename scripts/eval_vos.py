"""Referring-VOS benchmark CLI (MeViS / ReVOS / ReasonVOS / Ref-DAVIS).

Rebuild of the reference's per-benchmark shell drivers
(ref: evaluation/mevis_val_u/run_inference_mevis.sh + run_eval_mevis.sh):
`--subset_idx/--subset_num` shard the expression list; `--stage eval`
computes J&F from the written PNG masks.

  python scripts/eval_vos.py --stage infer --model_dir ... \
      --sam_pretrained ... --data_root .../mevis --split valid_u \
      --out_dir results/mevis --subset_idx 0 --subset_num 8
  python scripts/eval_vos.py --stage eval --data_root .../mevis \
      --split valid_u --out_dir results/mevis
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_segmentor(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rga3_tpu.config import SegHeadConfig
    from rga3_tpu.data.processor import QwenVLProcessor
    from rga3_tpu.evaluation.segmentor import UniGRSegmentor
    from rga3_tpu.models.qwen25vl import (
        QWEN25_VL_3B, QWEN25_VL_7B, tiny_config,
    )
    from rga3_tpu.models.qwen25vl.loader import load_unigr_params
    from rga3_tpu.models.sam2 import SAM2_HIERA_L, tiny_sam2_config
    from rga3_tpu.models.sam2.loader import load_sam2_params
    from rga3_tpu.models.unigr import UniGR, UniGRConfig

    processor = QwenVLProcessor.from_pretrained(args.model_dir)
    size = getattr(args, "model_size", "7b")
    qcfg = {"7b": QWEN25_VL_7B, "3b": QWEN25_VL_3B,
            "tiny": tiny_config()}[size]
    int8 = bool(getattr(args, "int8", False))
    int4 = bool(getattr(args, "int4", False))
    assert not (int8 and int4), "--int8 and --int4 are exclusive"
    quant_mode = "int4" if int4 else ("int8" if int8 else None)
    from rga3_tpu.ops.quant import is_quantized_dir, load_quantized

    prequantized = (
        args.model_dir != "dummy" and is_quantized_dir(args.model_dir)
    )
    if prequantized:
        # pre-quantized checkpoint (scripts/quantize_checkpoint.py):
        # kernels are already int8/int4 on disk; its meta decides the
        # config flags
        import json as _json
        import os as _os

        from rga3_tpu.ops.quant import QUANT_CKPT_META

        with open(_os.path.join(args.model_dir, QUANT_CKPT_META)) as f:
            qmeta = _json.load(f)
        quant_mode = qmeta["mode"]
        int8, int4 = quant_mode == "int8", quant_mode == "int4"
    if quant_mode:
        w8a8 = bool(getattr(args, "w8a8", False))
        kv_int8 = bool(getattr(args, "kv_int8", False))
        qcfg = qcfg.replace(
            text=qcfg.text.replace(
                quant_int8=int8, quant_int4=int4,
                quant_w8a8=w8a8 and int8, kv_cache_int8=kv_int8,
            ),
            vision=qcfg.vision.replace(
                quant_int8=True, quant_w8a8=w8a8 and int8,
            ),
        )
    scfg = SAM2_HIERA_L if size != "tiny" else tiny_sam2_config()
    cfg = UniGRConfig(
        qwen=qcfg, sam2=scfg,
        seg=SegHeadConfig(
            out_dim=scfg.d_model, seg_token_id=processor.seg_token_id
        ),
    )
    model = UniGR(cfg)
    if args.model_dir == "dummy":
        from flax.core import meta

        shapes = jax.eval_shape(
            lambda k: model.init(
                k,
                jnp.zeros((1, scfg.image_size, scfg.image_size, 3)),
                jnp.zeros((1, 1, scfg.d_model)),
                jnp.zeros((1, 8), jnp.int32),
            ),
            jax.random.PRNGKey(0),
        )
        def dummy_leaf(s):
            r = np.random.default_rng(0)
            if np.issubdtype(s.dtype, np.integer):
                # int8 kernel_q leaves: real quantized levels, not the
                # all-zero truncation of N(0, 0.02)
                return r.integers(-64, 65, s.shape).astype(s.dtype)
            return r.normal(0, 0.02, s.shape).astype(s.dtype)

        params = jax.tree.map(dummy_leaf, meta.unbox(shapes))
        quant_mode = None  # dummy init already matches the (possibly
        # quantized) tree layout; nothing to convert
    elif prequantized:
        params, _ = load_quantized(args.model_dir)
        quant_mode = None  # kernels already quantized on disk
        if (args.sam_pretrained
                and "grounding_encoder" not in params["params"]):
            params["params"]["grounding_encoder"] = load_sam2_params(
                args.sam_pretrained
            )["params"]
    else:
        params = load_unigr_params(args.model_dir)
        if (args.sam_pretrained
                and "grounding_encoder" not in params["params"]):
            params["params"]["grounding_encoder"] = load_sam2_params(
                args.sam_pretrained
            )["params"]
    if quant_mode:
        # quantize ONLY the qwen subtree — SAM2's two-way attention uses
        # the same q/k/v projection names but must stay float
        from rga3_tpu.ops.quant import quantize_for_serving

        params["params"]["qwen"] = quantize_for_serving(
            params["params"]["qwen"], quant_mode
        )
    return UniGRSegmentor(
        model, params, processor,
        num_frames_mllm=args.num_frames_mllm,
        compute_dtype=jnp.float32 if size == "tiny" else jnp.bfloat16,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["infer", "eval"], required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument(
        "--benchmark", default="mevis",
        choices=["mevis", "revos", "reasonvos", "davis", "ytvos"],
        help="selects the reference driver's prompt template + layout; "
        "revos eval adds accuracy/robustness splits; ytvos is "
        "inference-only (server-side eval, submission PNG tree)",
    )
    p.add_argument("--split", default="valid_u")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--model_dir")
    p.add_argument("--sam_pretrained")
    p.add_argument("--model_size", choices=["3b", "7b", "tiny"], default="7b")
    p.add_argument("--num_frames_mllm", type=int, default=8)
    p.add_argument("--subset_idx", type=int, default=0)
    p.add_argument("--subset_num", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only LLM + vision tower (ops.quant)")
    p.add_argument("--w8a8", action="store_true",
                   help="W8A8 prefill/vision with --int8: int8 MXU dots "
                   "at 2x bf16 FLOP rate (decode stays weight-only)")
    p.add_argument("--kv-int8", dest="kv_int8", action="store_true",
                   help="int8 KV cache (halves its decode HBM stream)")
    p.add_argument("--int4", action="store_true",
                   help="int4 weight-only LLM + int8 vision tower "
                   "(ref load_in_4bit, inference_mevis.py:70-93) — "
                   "HBM-CAPACITY ONLY on v5e: measured SLOWER than --int8 (7B 49.9 vs 92.6 tok/s with the partial-dot-scaled kernel; ~= bf16 speed at 3.6x less HBM)")
    args = p.parse_args()

    from rga3_tpu.evaluation.video_seg_eval import (
        run_eval, run_eval_revos, run_inference,
    )

    if args.stage == "infer":
        seg = build_segmentor(args)
        n = run_inference(
            seg, args.data_root, args.split, args.out_dir,
            subset_idx=args.subset_idx, subset_num=args.subset_num,
            benchmark=args.benchmark,
        )
        print(f"inferred {n} expressions", flush=True)
        if args.benchmark == "ytvos":
            print(
                "Ref-YTVOS is server-evaluated: zip the written "
                f"{args.out_dir} tree as Annotations/ for submission",
                flush=True,
            )
    elif args.benchmark == "ytvos":
        raise SystemExit(
            "Ref-YTVOS has no local eval stage (server-side J&F); "
            "run --stage infer and submit the PNG tree"
        )
    elif args.benchmark == "davis":
        from rga3_tpu.evaluation.davis_eval import (
            eval_davis_annotators, postprocess_davis,
        )
        from rga3_tpu.evaluation.video_seg_eval import resolve_layout

        ann, _ = resolve_layout(args.data_root, args.split, "davis")
        merged = os.path.join(args.out_dir, "merged")
        postprocess_davis(args.out_dir, ann, merged)
        # the unsupervised task evaluates against Annotations_unsupervised
        # (ref eval_davis.py default + davis.py GT layout)
        gt_dir = os.path.join(
            args.data_root, "Annotations_unsupervised", "480p"
        )
        if not os.path.isdir(gt_dir):
            gt_dir = os.path.join(args.data_root, args.split, "Annotations")
        scores = eval_davis_annotators(merged, gt_dir)
        print(json.dumps(scores, indent=2))
        with open(os.path.join(args.out_dir, "davis_scores.json"), "w") as f:
            json.dump(scores, f, indent=2)
    elif args.benchmark == "revos":
        scores = run_eval_revos(
            args.data_root, args.split, args.out_dir,
            num_workers=args.num_workers,
        )
        print(json.dumps(scores, indent=2))
        with open(os.path.join(args.out_dir, "revos_scores.json"), "w") as f:
            json.dump(scores, f, indent=2)
    else:
        scores = run_eval(
            args.data_root, args.split, args.out_dir,
            num_workers=args.num_workers,
        )
        print(json.dumps(scores, indent=2))
        with open(os.path.join(args.out_dir, "jf_scores.json"), "w") as f:
            json.dump(scores, f, indent=2)


if __name__ == "__main__":
    main()
