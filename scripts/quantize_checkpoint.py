"""Pre-quantize a UniGR (or plain Qwen2.5-VL) HF checkpoint to int8/int4.

Serving cold-start then loads int8/int4 kernels directly: ~2x/3.6x less
disk and host->device transfer (the slow hop on tunneled TPU setups)
than shipping fp weights and quantizing in-process. The quantization
itself matches ops.quant.quantize_for_serving (int4 mode = int4 LM +
int8 vision tower; SAM2 and the [SEG] projection stay float).

  python scripts/quantize_checkpoint.py --model_dir <hf-dir> \
      --out <dir> --bits 4 [--arch unigr|qwen]
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
    p.add_argument("--out", required=True)
    p.add_argument("--bits", type=int, choices=[4, 8], default=8)
    p.add_argument("--arch", choices=["unigr", "qwen"], default="unigr")
    args = p.parse_args()

    import jax

    # host-side transform: no reason to ship fp weights to a device
    jax.config.update("jax_platforms", "cpu")

    from rga3_tpu.models.qwen25vl.loader import (
        load_qwen25vl_params, load_unigr_params,
    )
    from rga3_tpu.ops.quant import quantize_for_serving, save_quantized

    mode = "int4" if args.bits == 4 else "int8"
    if args.arch == "unigr":
        params = load_unigr_params(args.model_dir)
        params["params"]["qwen"] = quantize_for_serving(
            params["params"]["qwen"], mode
        )
    else:
        params = load_qwen25vl_params(args.model_dir)
        params["params"] = quantize_for_serving(params["params"], mode)

    save_quantized(
        params, args.out,
        meta={"bits": args.bits, "mode": mode, "arch": args.arch,
              "source": os.path.abspath(args.model_dir)},
    )
    # carry the tokenizer/processor files so the quantized dir is a
    # drop-in --model_dir for the eval/serve entry points
    import shutil

    for name in ("tokenizer.json", "tokenizer_config.json", "vocab.json",
                 "merges.txt", "preprocessor_config.json",
                 "chat_template.json", "special_tokens_map.json"):
        src = os.path.join(args.model_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, name))
    print(json.dumps({"out": args.out, "mode": mode, "arch": args.arch}))


if __name__ == "__main__":
    main()
