"""VideoInfer baseline comparison runner
(ref evaluation/videoinfer/baselines/run_inference.sh).

GPT-4o over any OpenAI-compatible endpoint:

  python scripts/eval_videoinfer_baselines.py --data_root <VideoInfer> \
      --baseline gpt4o --model gpt-4o \
      --out results/RefVideoQA/GPT-4o-high-8frames/merged_result.json

Local-model baselines (the reference's Osprey / VideoLLaMA3 /
VideoRefer rows) plug a callable into
rga3_tpu.evaluation.videoinfer_baselines.run_local_baseline — this CLI
drives the API baseline only. Subset sharding mirrors the reference's
`i % subset_num == subset_idx` striding. Score the merged_result.json
with scripts/eval_videoinfer.py --stage eval.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--baseline", choices=["gpt4o"], default="gpt4o")
    p.add_argument("--model", default="gpt-4o")
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--subset_idx", type=int, default=0)
    p.add_argument("--subset_num", type=int, default=1)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from rga3_tpu.evaluation.gpt_judge import openai_transport
    from rga3_tpu.evaluation.videoinfer_baselines import run_gpt4o_baseline

    from eval_videoinfer import load_items  # scripts/ sibling

    items = (
        item
        for i, item in enumerate(
            load_items(args.data_root, args.split, args.num_frames)
        )
        if i % args.subset_num == args.subset_idx
    )
    results = run_gpt4o_baseline(
        items, openai_transport(args.model), args.out
    )
    n = sum(
        len(qas)
        for exps in results.values()
        for qas in exps.values()
    )
    print(f"{n} answers -> {args.out}")


if __name__ == "__main__":
    main()
