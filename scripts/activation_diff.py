"""Per-block activation-diff harness: our Qwen2.5-VL decoder vs HF
transformers, layer by layer, at a chosen compute dtype.

SURVEY.md hard part #4: checkpoints were trained with CUDA flash-attn in
bf16 and the README itself flags Qwen bf16 drift (ref README.md:35-36) —
this tool quantifies where numeric divergence enters, block by block,
before it can hurt benchmark parity.

  python scripts/activation_diff.py --tiny --dtype bf16       # self-test
  python scripts/activation_diff.py --hf_dir Qwen2.5-VL-7B-Instruct \
      --dtype bf16 --len 128
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_dir", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="random tiny HF model instead of --hf_dir")
    p.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--len", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import numpy as np
    import torch
    import transformers

    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.dtype == "fp32":
        # isolate real drift from CPU matmul downcasts
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from rga3_tpu.models.qwen25vl.config import (
        Qwen25VLConfig, QwenTextConfig, QwenVisionConfig,
    )
    from rga3_tpu.models.qwen25vl.loader import _set, map_hf_key
    from rga3_tpu.models.qwen25vl.model import Qwen25VL

    if args.tiny:
        hf_cfg = transformers.Qwen2_5_VLConfig(
            vocab_size=5000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e6, tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            vision_config=dict(
                depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
                patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
                window_size=28, fullatt_block_indexes=[1],
                out_hidden_size=64, tokens_per_second=2,
            ),
        )
        torch.manual_seed(args.seed)
        hf = transformers.Qwen2_5_VLForConditionalGeneration(hf_cfg)
    else:
        hf = transformers.Qwen2_5_VLForConditionalGeneration.from_pretrained(
            args.hf_dir, torch_dtype=torch.float32
        )
        hf_cfg = hf.config
    hf = hf.eval()

    tc = hf_cfg
    ours_cfg = Qwen25VLConfig(
        vision=QwenVisionConfig(
            depth=tc.vision_config.depth,
            hidden_size=tc.vision_config.hidden_size,
            intermediate_size=tc.vision_config.intermediate_size,
            num_heads=tc.vision_config.num_heads,
            patch_size=tc.vision_config.patch_size,
            spatial_merge_size=tc.vision_config.spatial_merge_size,
            temporal_patch_size=tc.vision_config.temporal_patch_size,
            window_size=tc.vision_config.window_size,
            fullatt_block_indexes=tuple(
                tc.vision_config.fullatt_block_indexes
            ),
            out_hidden_size=tc.vision_config.out_hidden_size,
            tokens_per_second=tc.vision_config.tokens_per_second,
        ),
        text=QwenTextConfig(
            vocab_size=tc.vocab_size,
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_hidden_layers=tc.num_hidden_layers,
            num_attention_heads=tc.num_attention_heads,
            num_key_value_heads=tc.num_key_value_heads,
            head_dim=tc.hidden_size // tc.num_attention_heads,
            rope_theta=tc.rope_theta,
            mrope_section=tuple(tc.rope_scaling["mrope_section"]),
            tie_word_embeddings=tc.tie_word_embeddings,
        ),
    )
    model = Qwen25VL(ours_cfg)

    params: dict = {}
    for k, v in hf.state_dict().items():
        mapped = map_hf_key(k)
        if mapped is None:
            continue
        path, t = mapped
        arr = v.float().numpy()
        if t == "conv3d":
            arr = arr.reshape(arr.shape[0], -1).T
        elif t:
            arr = arr.T
        _set(params, path, arr)
    params = {"params": params}

    rng = np.random.default_rng(args.seed)
    ids = rng.integers(10, min(tc.vocab_size, 30_000), (1, args.len))
    ids_t = torch.from_numpy(ids)

    with torch.no_grad():
        hf_auto = (
            torch.autocast("cpu", dtype=torch.bfloat16)
            if args.dtype == "bf16" else torch.no_grad()
        )
        with hf_auto:
            hf_out = hf(
                input_ids=ids_t, output_hidden_states=True
            )
    hf_hidden = [h.float().numpy() for h in hf_out.hidden_states]

    cdtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    out, inter = model.apply(
        params,
        input_ids=jnp.asarray(ids, jnp.int32),
        compute_dtype=cdtype,
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    inters = inter["intermediates"]["lm"]["model"]

    print(f"dtype={args.dtype} len={args.len} "
          f"layers={tc.num_hidden_layers}")
    print(f"{'block':<12}{'max_abs':>12}{'rel':>12}")
    for i in range(tc.num_hidden_layers):
        if i == tc.num_hidden_layers - 1:
            # HF's final hidden_states entry is post-final-norm; compare
            # against our normed hidden_states output
            ours_i = np.asarray(out["hidden_states"], np.float32)
        else:
            ours_i = np.asarray(
                inters[f"layers_{i}"]["__call__"][0][0], np.float32
            )
        ref_i = hf_hidden[i + 1]
        d = np.abs(ours_i - ref_i)
        rel = d.max() / (np.abs(ref_i).max() + 1e-9)
        print(f"layers_{i:<5}{d.max():>12.5f}{rel:>12.2e}")
    logits = np.asarray(out["logits"], np.float32)
    hf_logits = hf_out.logits.float().numpy()
    d = np.abs(logits - hf_logits)
    print(f"{'logits':<12}{d.max():>12.5f}"
          f"{d.max() / (np.abs(hf_logits).max() + 1e-9):>12.2e}")
    agree = (logits.argmax(-1) == hf_logits.argmax(-1)).mean()
    print(f"greedy next-token agreement: {agree:.3f}")


if __name__ == "__main__":
    main()
