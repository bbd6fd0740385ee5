"""Launch the UniGR demo server (ref app.py equivalent).

  python scripts/serve_app.py --model_dir ... --sam_pretrained ... \
      --port 7860
Without --model_dir the server runs with stub responses (UI smoke test).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", default=None)
    p.add_argument("--sam_pretrained", default=None)
    p.add_argument("--model_size", choices=["3b", "7b"], default="7b")
    p.add_argument("--port", type=int, default=7860)
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
                   help="HF dir of a smaller Qwen2.5-VL used as a "
                   "speculative-decoding draft (token-exact greedy)")
    p.add_argument("--spec_k", type=int, default=4)
    p.add_argument("--qa_batch_window_ms", type=int, default=0,
                   help=">0 coalesces concurrent QA requests into one "
                   "answer_batch call (decode is weight-bound: ~linear "
                   "aggregate throughput) at up to this much added "
                   "latency per request")
    p.add_argument("--qa_max_batch", type=int, default=4)
    args = p.parse_args()

    from rga3_tpu.serve.app import UniGRService, serve

    chat = segmentor = None
    if args.model_dir:
        from scripts.eval_vos import build_segmentor

        class A:
            pass

        a = A()
        a.model_dir = args.model_dir
        a.sam_pretrained = args.sam_pretrained
        a.model_size = args.model_size
        a.num_frames_mllm = 8
        a.int8 = args.int8
        a.w8a8 = args.w8a8
        a.kv_int8 = args.kv_int8
        a.int4 = args.int4
        segmentor = build_segmentor(a)

        from rga3_tpu.evaluation.segmentor import UniGRChat
        from rga3_tpu.models.qwen25vl.model import Qwen25VL

        draft_model = draft_params = None
        if args.draft_dir:
            from rga3_tpu.models.qwen25vl import QWEN25_VL_3B
            from rga3_tpu.models.qwen25vl.loader import load_qwen25vl_params

            draft_model = Qwen25VL(QWEN25_VL_3B)
            draft_params = load_qwen25vl_params(args.draft_dir)
        chat = UniGRChat(
            Qwen25VL(segmentor.model.cfg.qwen),
            {"params": segmentor.params["params"]["qwen"]},
            segmentor.processor,
            draft_model=draft_model,
            draft_params=draft_params,
            spec_k=args.spec_k,
        )
    print(f"serving on :{args.port}", flush=True)
    serve(
        UniGRService(
            chat=chat, segmentor=segmentor,
            qa_batch_window_ms=args.qa_batch_window_ms,
            qa_max_batch=args.qa_max_batch,
        ),
        port=args.port,
    )


if __name__ == "__main__":
    main()
