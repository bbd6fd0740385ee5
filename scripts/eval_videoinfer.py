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


def load_qa_data(data_root: str, split: str = "test"):
    with open(os.path.join(data_root, f"{split}.json")) as f:
        return json.load(f)


def load_items(data_root: str, split: str = "test", num_frames: int = 8):
    """Published VideoInfer layout, byte-matched to the reference reader
    (ref inference_videoinfer.py:22-124):

      <root>/<split>.json — {vid: {"expressions": {exp: {"QA": {qa:
          {"Q", "A"}}, "overlayed_frame_idx", "color", "shape",
          "anno_id"}}}}
      <root>/frames/<vid>/*.jpg         (sorted; frame idx = list index)
      <root>/visual_prompts/<vid>/<exp>/<shape>.npz  key "arr_0", RGBA
      <root>/mask_dict.json             {str(anno_id): [RLE-or-None] * T}

    MLLM frames = get_sparse_indices(T, num_frames-1) + the overlayed
    frame, sorted (ref :77-80). Item ids use the GPT-batch custom_id
    convention "vid____exp____qa" (ref eval_gpt.ipynb)."""
    from PIL import Image

    from rga3_tpu.data.templates import get_sparse_indices

    qa_data = load_qa_data(data_root, split)
    for vid_id, vid in qa_data.items():
        image_files = sorted(
            glob.glob(os.path.join(data_root, "frames", vid_id, "*.jpg"))
        )
        total = len(image_files)
        for exp_id, exp in vid["expressions"].items():
            key_frame = exp["overlayed_frame_idx"]
            shape = exp["shape"]
            npz_path = os.path.join(
                data_root, "visual_prompts", vid_id, exp_id, f"{shape}.npz"
            )
            overlay = None
            if os.path.exists(npz_path):
                overlay = np.load(npz_path)["arr_0"].astype(np.uint8)
            sparse = get_sparse_indices(total, num_frames - 1)
            sparse.append(key_frame)
            sparse = sorted(sparse)
            frames = [
                np.asarray(Image.open(image_files[i]).convert("RGB"))
                for i in sparse
            ]
            for qa_id, qa in exp["QA"].items():
                yield {
                    "id": f"{vid_id}____{exp_id}____{qa_id}",
                    "vid_id": vid_id,
                    "exp_id": exp_id,
                    "qa_id": qa_id,
                    "frames": frames,
                    "question": qa["Q"],
                    "answer": qa.get("A", ""),
                    "vip_overlay": overlay,
                    "key_idx": sparse.index(key_frame),
                    "shape": shape,
                    "color": exp.get("color"),
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
    p.add_argument("--batch_size", type=int, default=4,
                   help=">1 batches prefill+decode via answer_batch "
                   "(weight-bound decode: near-linear eval speedup)")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only LLM + vision tower (ops.quant)")
    p.add_argument("--w8a8", action="store_true",
                   help="W8A8 prefill/vision with --int8: int8 MXU dots "
                   "at 2x bf16 FLOP rate (decode stays weight-only)")
    p.add_argument("--kv-int8", dest="kv_int8", action="store_true",
                   help="int8 KV cache (halves its decode HBM stream)")
    p.add_argument("--int4", action="store_true",
                   help="int4 weight-only LLM + int8 vision tower — HBM-CAPACITY ONLY on v5e: measured SLOWER than --int8 (7B 49.9 vs 92.6 tok/s with the partial-dot-scaled kernel; ~= bf16 speed at 3.6x less HBM)")
    p.add_argument("--draft_dir",
                   help="HF dir of a smaller Qwen2.5-VL (3B) used as a "
                   "speculative-decoding draft (token-exact greedy)")
    p.add_argument("--spec_k", type=int, default=4,
                   help="draft proposal length per verify step")
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
        a.w8a8 = args.w8a8
        a.kv_int8 = args.kv_int8
        a.int4 = args.int4
        seg = build_segmentor(a)

        from rga3_tpu.evaluation.segmentor import UniGRChat
        from rga3_tpu.models.qwen25vl.model import Qwen25VL

        draft_model = draft_params = None
        if args.draft_dir and args.batch_size != 1:
            # speculative decoding lives on the batch-1 latency path;
            # answer_batch would silently ignore the loaded draft
            print("--draft_dir forces --batch_size 1", file=sys.stderr)
            args.batch_size = 1
        if args.draft_dir:
            # speculative decoding: a smaller Qwen2.5-VL drafts, the
            # 7B verifies (token-exact greedy; batch_size must be 1)
            from rga3_tpu.models.qwen25vl import QWEN25_VL_3B
            from rga3_tpu.models.qwen25vl.loader import load_qwen25vl_params

            draft_model = Qwen25VL(QWEN25_VL_3B)
            draft_params = load_qwen25vl_params(args.draft_dir)
        chat = UniGRChat(
            Qwen25VL(seg.model.cfg.qwen),
            {"params": seg.params["params"]["qwen"]},
            seg.processor,
            max_new_tokens=args.max_new_tokens,
            draft_model=draft_model,
            draft_params=draft_params,
            spec_k=args.spec_k,
        )
        n = vi.run_inference(
            chat, list(load_items(args.data_root, args.split)), args.out,
            use_stom=args.use_stom, subset_idx=args.subset_idx,
            subset_num=args.subset_num, batch_size=args.batch_size,
        )
        print(f"inferred {n} items")
    elif args.stage == "merge":
        shards = sorted(glob.glob(args.shards))
        n = vi.merge_shards(shards, args.out)
        print(f"merged {n} predictions from {len(shards)} shards")
    else:
        qa_data = load_qa_data(args.data_root, args.split)
        answers = {
            f"{vid}____{exp_id}____{qa_id}": qa["A"]
            for vid, v in qa_data.items()
            for exp_id, exp in v["expressions"].items()
            for qa_id, qa in exp["QA"].items()
            if qa.get("A")  # unanswered probes can't be scored
        }
        scores = vi.run_eval(args.out, answers)
        print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    main()
