"""VideoInfer benchmark CLI (region-level video QA).

Rebuild of ref evaluation/videoinfer/run_inference_parallel.sh + merge.py
+ eval.py: shardable inference with fixed RGBA prompt overlays (optionally
STOM-propagated), shard merge, caption metrics.

  # 8-way sharded inference (one process per host/chip)
  python scripts/eval_videoinfer.py --stage infer --model_dir ... \
      --data_root data/videoinfer --out results/videoinfer/pred_0.jsonl \
      --subset_idx 0 --subset_num 8 --use_stom
  python scripts/eval_videoinfer.py --stage merge \
      --out results/videoinfer/pred.jsonl \
      --shards 'results/videoinfer/pred_*.jsonl'
  python scripts/eval_videoinfer.py --stage eval \
      --data_root data/videoinfer --out results/videoinfer/pred.jsonl
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_items(data_root: str, split: str = "test"):
    """VideoInfer layout: <root>/<split>.json with per-item video dirs,
    questions, .npz RGBA overlays (ref inference_videoinfer.py:57-124)."""
    from rga3_tpu.data.video import load_frames_from_dir

    path = os.path.join(data_root, f"{split}.json")
    with open(path) as f:
        raw = json.load(f)
    for item in raw:
        frames = load_frames_from_dir(
            os.path.join(data_root, "frames", item["video"])
        )
        overlay = None
        npz = item.get("vip_path")
        if npz:
            with np.load(os.path.join(data_root, npz)) as z:
                overlay = z[z.files[0]].astype(np.uint8)
        yield {
            "id": item["id"],
            "frames": frames,
            "question": item["question"],
            "vip_overlay": overlay,
            "key_idx": item.get("key_idx", 0),
            "shape": item.get("shape", "rectangle"),
        }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["infer", "merge", "eval"],
                   required=True)
    p.add_argument("--data_root")
    p.add_argument("--split", default="test")
    p.add_argument("--out", required=True)
    p.add_argument("--shards", default=None)
    p.add_argument("--model_dir")
    p.add_argument("--model_size", choices=["3b", "7b"], default="7b")
    p.add_argument("--subset_idx", type=int, default=0)
    p.add_argument("--subset_num", type=int, default=1)
    p.add_argument("--use_stom", action="store_true")
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only LLM + vision tower (ops.quant)")
    args = p.parse_args()

    from rga3_tpu.evaluation import videoinfer_eval as vi

    if args.stage == "infer":
        from scripts.eval_vos import build_segmentor

        class A:
            pass

        a = A()
        a.model_dir = args.model_dir
        a.sam_pretrained = None
        a.model_size = args.model_size
        a.num_frames_mllm = 8
        a.int8 = args.int8
        seg = build_segmentor(a)

        from rga3_tpu.evaluation.segmentor import UniGRChat
        from rga3_tpu.models.qwen25vl.model import Qwen25VL

        chat = UniGRChat(
            Qwen25VL(seg.model.cfg.qwen),
            {"params": seg.params["params"]["qwen"]},
            seg.processor,
            max_new_tokens=args.max_new_tokens,
        )
        n = vi.run_inference(
            chat, list(load_items(args.data_root, args.split)), args.out,
            use_stom=args.use_stom, subset_idx=args.subset_idx,
            subset_num=args.subset_num,
        )
        print(f"inferred {n} items")
    elif args.stage == "merge":
        shards = sorted(glob.glob(args.shards))
        n = vi.merge_shards(shards, args.out)
        print(f"merged {n} predictions from {len(shards)} shards")
    else:
        with open(os.path.join(args.data_root, f"{args.split}.json")) as f:
            answers = {
                item["id"]: item["answer"] for item in json.load(f)
                if "answer" in item
            }
        scores = vi.run_eval(args.out, answers)
        print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    main()
