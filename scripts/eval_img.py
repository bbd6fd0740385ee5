"""Image segmentation evaluation CLI: the 12 reference validation splits
(ReasonSeg val/test + RefCOCO/+/g), gIoU/cIoU.

Rebuild of ref evaluation/eval_img/val.py + run_val.sh (12 splits across
8 GPUs; here one process handles any subset, shard with --datasets):

  # everything on disk
  python scripts/eval_img.py --model_dir UniGR-7B --data_root ./data \
      --out results/img_seg.json
  # one split
  python scripts/eval_img.py --model_dir UniGR-7B --data_root ./data \
      --datasets refcoco:val --out results/refcoco_val.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--sam_pretrained", default=None)
    p.add_argument("--model_size", choices=["3b", "7b", "tiny"],
                   default="7b")
    p.add_argument("--data_root", required=True)
    p.add_argument(
        "--datasets", default="all",
        help="comma list of <dataset>:<split> (refcoco:val, refcocog:test, "
        "reason_seg:val, ...) or 'all' for the 12 reference splits",
    )
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--w8a8", action="store_true",
                   help="W8A8 prefill/vision with --int8: int8 MXU dots "
                   "at 2x bf16 FLOP rate (decode stays weight-only)")
    p.add_argument("--kv-int8", dest="kv_int8", action="store_true",
                   help="int8 KV cache (halves its decode HBM stream)")
    p.add_argument("--int4", action="store_true",
                   help="int4 weight-only LLM + int8 vision tower — HBM-CAPACITY ONLY on v5e: measured SLOWER than --int8 (7B 49.9 vs 92.6 tok/s with the partial-dot-scaled kernel; ~= bf16 speed at 3.6x less HBM)")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from scripts.eval_vos import build_segmentor

    class A:
        pass

    a = A()
    a.model_dir = args.model_dir
    a.sam_pretrained = args.sam_pretrained
    a.model_size = args.model_size
    a.num_frames_mllm = 1
    a.int8 = args.int8
    a.w8a8 = args.w8a8
    a.kv_int8 = args.kv_int8
    a.int4 = args.int4
    seg = build_segmentor(a)

    from rga3_tpu.evaluation.image_seg_eval import (
        run_all_image_seg_vals, run_reason_seg_val, run_refer_seg_val,
    )

    if args.datasets == "all":
        scores = run_all_image_seg_vals(
            seg, args.data_root, max_samples=args.max_samples
        )
    else:
        scores = {}
        for spec in args.datasets.split(","):
            ds, _, split = spec.partition(":")
            split = split or "val"
            if ds == "reason_seg":
                scores[f"ReasonSeg|{split}"] = run_reason_seg_val(
                    seg, args.data_root, split,
                    max_samples=args.max_samples,
                )
            else:
                scores[f"{ds}|{split}"] = run_refer_seg_val(
                    seg, args.data_root, ds, split,
                    max_samples=args.max_samples,
                )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(scores, f, indent=2)
    print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    main()
