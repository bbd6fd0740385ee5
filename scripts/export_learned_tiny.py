"""Export the learning-proof run's best checkpoint as a params-only
f16 npz (small enough to commit as evidence) and re-measure its val
gIoU against the random-init baseline on a fresh learnable fixture.

The learning-proof run drives the REAL entry point (scripts/train.py,
ref train_joint.py:464-648) on tests/synth_data.build_learn_root — a
visible-target ReasonSeg-layout task with DISJOINT train/val positions,
so val improvement proves the [SEG]->SAM pathway learns from pixels,
not memorization.

Usage:
  python scripts/export_learned_tiny.py \
      --ckpt_dir runs/learning_proof_tiny/ckpt \
      --out runs/learning_proof_tiny/params_f16.npz
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_train_tiny_model():
    """The exact model scripts/train.py builds for --model_size tiny
    with the release LoRA dims (its defaults)."""
    from rga3_tpu.config import SegHeadConfig
    from rga3_tpu.data.processor import QwenVLProcessor
    from rga3_tpu.models.qwen25vl import tiny_config
    from rga3_tpu.models.sam2 import tiny_sam2_config
    from rga3_tpu.models.unigr import UniGR, UniGRConfig

    proc = QwenVLProcessor.from_pretrained("dummy")
    qcfg = tiny_config()
    qcfg = qcfg.replace(
        text=qcfg.text.replace(lora_rank=128, lora_alpha=256.0,
                               scan_layers=False)
    )
    scfg = tiny_sam2_config()
    cfg = UniGRConfig(
        qwen=qcfg, sam2=scfg,
        seg=SegHeadConfig(out_dim=scfg.d_model,
                          seg_token_id=proc.seg_token_id),
    )
    return UniGR(cfg), cfg, proc


def flatten_params(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params_npz(path, params):
    flat = flatten_params(params["params"])
    packed = {}
    for k, v in flat.items():
        packed[k] = v.astype(np.float16) if v.dtype == np.float32 else v
    np.savez_compressed(path, **packed)


def load_params_npz(path):
    with np.load(path) as z:
        flat = {
            k: z[k].astype(np.float32)
            if z[k].dtype == np.float16 else z[k]
            for k in z.files
        }
    return {"params": unflatten_params(flat)}


def eval_giou(model, params, proc, root, split="val", n=8):
    from rga3_tpu.evaluation.image_seg_eval import run_reason_seg_val
    from rga3_tpu.evaluation.segmentor import UniGRSegmentor

    seg = UniGRSegmentor(
        model, params, proc, num_frames_mllm=2,
        compute_dtype=jnp.bfloat16,
    )
    return run_reason_seg_val(seg, root, split=split, max_samples=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="runs/learning_proof_tiny/ckpt")
    ap.add_argument("--out", default="runs/learning_proof_tiny/params_f16.npz")
    ap.add_argument("--fixture", default="/tmp/learn_root_eval")
    ap.add_argument("--tag", default="best")
    args = ap.parse_args()

    from rga3_tpu.train.checkpoints import CheckpointManager

    model, cfg, proc = build_train_tiny_model()

    ckpt = CheckpointManager(args.ckpt_dir)
    state = ckpt.restore(args.tag)
    params = {"params": state["params"]["params"]}
    save_params_npz(args.out, params)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"saved {args.out} ({size_mb:.1f} MB)")

    # roundtrip check: the npz must rebuild the tree exactly (f16 cast)
    reloaded = load_params_npz(args.out)
    n_leaves = len(jax.tree.leaves(reloaded))
    assert n_leaves == len(jax.tree.leaves(params)), "leaf count mismatch"

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from synth_data import build_learn_root

    build_learn_root(args.fixture, seed=7)  # fresh positions, new seed

    trained = eval_giou(model, reloaded, proc, args.fixture)
    print(f"trained (f16 roundtrip) val: {trained}")

    # random-init baseline on the same fixture
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 1000, (1, 8)).astype(np.int32))
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.normal(size=(2, cfg.sam2.image_size,
                                     cfg.sam2.image_size, 3))
                    .astype(np.float32)),
        jnp.zeros((2, 1, cfg.seg.out_dim), jnp.float32),
        ids,
    )
    baseline = eval_giou(model, init, proc, args.fixture)
    print(f"random-init val: {baseline}")

    summary = {
        "npz": args.out, "size_mb": round(size_mb, 1),
        "trained_gIoU": trained["gIoU"], "trained_cIoU": trained["cIoU"],
        "init_gIoU": baseline["gIoU"], "init_cIoU": baseline["cIoU"],
    }
    with open(os.path.join(os.path.dirname(args.out),
                           "export_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
