"""Validate the RELEASE training mesh — (data=4, fsdp=4) over 16 devices
— and measure per-step collective volume from the compiled HLO.

The 7B throughput projection (bench extras `train_7b_projection`)
previously assumed a flat −5% FSDP comm cost; this script replaces the
guess with compiled-HLO evidence:

1. builds the release 16-way mesh on virtual CPU devices
   (ref: run_torchrun.sh:6-23 — 2 nodes x 8 H800, ZeRO-2), with the
   same (data, fsdp) split the projection assumes;
2. builds UniGR at 7B-PROPORTIONED dims (every 7B text dim / `scale`,
   head_dim/GQA/vocab divisibility preserved, LoRA r128 on q/v as in
   the release run) so every sharding rule fires exactly as it would
   at 7B;
3. jits the FULL train step (grad accum scan + masked AdamW) over the
   mesh, compiles, and parses the optimized HLO for all-reduce /
   all-gather / reduce-scatter / collective-permute volumes;
4. runs ONE step (loss finite) and records per-device param bytes;
5. writes a MULTICHIP-style JSON with measured comm bytes and the
   param-proportional scale-up to real 7B.

Usage: python scripts/validate_release_mesh.py [--out runs/release_mesh_16.json]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

N_DEVICES = 16

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEVICES}"
).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

# `bf16[4,896]{1,0}` or tuple shapes `(f32[...], f32[...])`
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def hlo_collective_bytes(hlo_text: str):
    """Sum output bytes of every collective instruction, by kind.

    Counts the per-device OUTPUT size of each collective op (the data a
    device materializes from the wire; for all-reduce this equals the
    tensor size, for all-gather the gathered size). Fusion cannot hide
    collectives — XLA always emits them as top-level instructions."""
    out = {k: 0 for k in _COLLECTIVES}
    counts = {k: 0 for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        s = line.strip()
        # instruction lines look like: `%name = <shape> op-name(...)`
        m = re.match(r"%?[\w.\-]+\s*=\s*(.*)$", s)
        if not m:
            continue
        rest = m.group(1)
        kind = None
        for k in _COLLECTIVES:
            # match ` all-gather(` / `all-gather-start(` as the op
            if re.search(rf"\b{k}(-start)?\(", rest):
                kind = k
                break
        if kind is None:
            continue
        nbytes = 0
        # the shape prefix is everything before the op name
        prefix = rest.split(kind)[0]
        for dm in _SHAPE_RE.finditer(prefix):
            dt, dims = dm.groups()
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        out[kind] += nbytes
        counts[kind] += 1
    return out, counts


def release_proportioned_unigr(scale: int = 4):
    """UniGR at 7B dims / `scale` (text + vision), SAM2 at reduced dims.

    Preserves: head_dim 128, GQA ratio 7:1, full 152064 vocab (embedding
    sharding divisibility is the release constraint), LoRA r128 on q/v,
    scan_layers (the 7B compile regime)."""
    from rga3_tpu.config import SegHeadConfig
    from rga3_tpu.models.qwen25vl import QWEN25_VL_7B
    from rga3_tpu.models.sam2 import tiny_sam2_config
    from rga3_tpu.models.unigr import UniGR, UniGRConfig

    t7 = QWEN25_VL_7B.text
    v7 = QWEN25_VL_7B.vision
    text = t7.replace(
        hidden_size=t7.hidden_size // scale,        # 896
        intermediate_size=t7.intermediate_size // scale,  # 4736
        num_hidden_layers=t7.num_hidden_layers // scale,  # 7
        num_attention_heads=t7.num_attention_heads // scale,  # 7
        num_key_value_heads=max(t7.num_key_value_heads // scale, 1),  # 1
        lora_rank=128, lora_alpha=256.0,
        scan_layers=True,
    )
    vision = v7.replace(
        depth=v7.depth // scale,                 # 8
        hidden_size=v7.hidden_size // scale,     # 320
        intermediate_size=v7.intermediate_size // scale,
        num_heads=v7.num_heads // scale,         # 4
        fullatt_block_indexes=(3, 7),
        out_hidden_size=t7.hidden_size // scale,
    )
    qcfg = QWEN25_VL_7B.replace(text=text, vision=vision)
    scfg = tiny_sam2_config(image_size=128).replace(d_model=64)
    seg_id = 151665
    cfg = UniGRConfig(
        qwen=qcfg, sam2=scfg,
        seg=SegHeadConfig(out_dim=64, seg_token_id=seg_id),
    )
    return UniGR(cfg, remat="dots"), cfg, seg_id


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/release_mesh_16.json")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--accum", type=int, default=2)
    args = ap.parse_args()

    from rga3_tpu.config import MeshConfig, TrainConfig
    from rga3_tpu.parallel.mesh import make_mesh
    from rga3_tpu.train.step import build_train_step, make_train_state

    assert jax.device_count() >= N_DEVICES, jax.device_count()
    mcfg = MeshConfig(data=4, fsdp=4, tensor=1)  # the projection's mesh
    mesh = make_mesh(mcfg, jax.devices()[:N_DEVICES])
    print(f"mesh: {dict(mesh.shape)}", flush=True)

    model, cfg, seg_id = release_proportioned_unigr(args.scale)
    rng = np.random.default_rng(0)
    ACC = args.accum
    B = 2 * mcfg.data  # release micro-bs 2 per data rank
    L, T = args.seq, 2
    img = cfg.sam2.image_size
    ids = rng.integers(0, 1000, size=(ACC, B, L)).astype(np.int32)
    ids[..., 8] = seg_id
    labels = ids.copy()
    labels[..., :4] = -100
    images_sam = rng.integers(
        0, 256, size=(ACC, B, T, img, img, 3)
    ).astype(np.uint8)
    gt = (rng.random((ACC, B, T, 64, 64)) > 0.5).astype(np.float32)
    pos = np.broadcast_to(
        np.arange(L)[None, None, None], (ACC, 3, B, L)
    ).astype(np.int32).copy()

    t0 = time.time()
    # real init (CPU, one core — the embedding dominates)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((T, img, img, 3), jnp.float32),
        jnp.zeros((T, 1, cfg.seg.out_dim), jnp.float32),
        jnp.asarray(ids[0]),
    )
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(params)
    )
    print(f"init {n_params/1e6:.1f}M params in {time.time()-t0:.0f}s",
          flush=True)

    tcfg = TrainConfig(grad_accum_steps=ACC)
    with mesh:
        state, tx = make_train_state(tcfg, params, mesh)
        del params

        def loss_fn(p, batch):
            return model.apply(
                p,
                batch["input_ids"], batch["labels"],
                batch["position_ids"], None,
                batch["images_sam"], batch["gt_masks"],
                jnp.ones((batch["input_ids"].shape[0],)),
                compute_dtype=jnp.bfloat16,
                method=type(model).train_forward,
            )

        step = build_train_step(loss_fn, tx, grad_accum_steps=ACC)

        def put(x, batch_axis):
            # micro-bs 2 x data=4 -> batch 8: shard over data only (the
            # release regime; 8 doesn't divide data*fsdp=16 — same rule
            # as train.py's batch_axis_spec)
            spec = [None] * x.ndim
            spec[batch_axis] = "data"
            return jax.device_put(
                jnp.asarray(x), NamedSharding(mesh, P(*spec))
            )

        batch = {
            "input_ids": put(ids, 1),
            "labels": put(labels, 1),
            "position_ids": put(pos, 2),
            "images_sam": put(images_sam, 1),
            "gt_masks": put(gt, 1),
        }

        t0 = time.time()
        lowered = step.lower(state, batch)
        compiled = lowered.compile()
        compile_s = time.time() - t0
        print(f"compiled in {compile_s:.0f}s", flush=True)

        hlo = compiled.as_text()
        comm, counts = hlo_collective_bytes(hlo)
        total_comm = sum(comm.values())

        # per-device param + optimizer bytes (the FSDP memory claim)
        def shard_bytes(tree):
            total = 0
            for x in jax.tree.leaves(tree):
                if hasattr(x, "addressable_shards"):
                    s = x.addressable_shards[0]
                    total += int(
                        np.prod(s.data.shape) * s.data.dtype.itemsize
                    )
            return total

        per_dev_param = shard_bytes(state.params)
        per_dev_opt = shard_bytes(state.opt_state)

        t0 = time.time()
        new_state, aux = step(state, batch)
        loss = float(aux["loss"])
        step_s = time.time() - t0
        assert np.isfinite(loss), loss
        assert int(new_state.step) == 1

    # scale comm to real 7B: collectives here are param-proportional
    # (all-gather of sharded params fwd+bwd, all-reduce/reduce-scatter of
    # grads over data/fsdp); batch-proportional terms are negligible
    # beside them at these sizes. 7B UniGR trainable+frozen LM tree that
    # rides the fsdp axis ~= 7.6B params bf16.
    param_bytes_here = 4 * n_params  # f32 master params
    projected_comm_7b = {
        k: int(v * (7.6e9 * 2) / (2 * n_params))  # bf16 wire bytes ratio
        for k, v in comm.items()
    }
    record = {
        "ok": True,
        "mesh": {"data": 4, "fsdp": 4, "tensor": 1},
        "n_devices": N_DEVICES,
        "model": {
            "proportion": f"7B/{args.scale}",
            "params_m": round(n_params / 1e6, 1),
            "text_hidden": cfg.qwen.text.hidden_size,
            "layers": cfg.qwen.text.num_hidden_layers,
            "lora_rank": cfg.qwen.text.lora_rank,
            "scan_layers": cfg.qwen.text.scan_layers,
        },
        "batch": {"accum": ACC, "micro_global": B, "seq": L,
                  "sam_frames": T, "sam_size": img},
        "loss": loss,
        "compile_s": round(compile_s, 1),
        "step_s_virtual_cpu": round(step_s, 1),
        "per_device_param_bytes": per_dev_param,
        "per_device_opt_bytes": per_dev_opt,
        "hlo_collective_bytes_per_step": comm,
        "hlo_collective_counts": counts,
        "hlo_collective_total_bytes": total_comm,
        "param_bytes_total": param_bytes_here,
        "comm_to_param_ratio": round(total_comm / param_bytes_here, 3),
        "projected_7b_collective_bytes": projected_comm_7b,
        "note": (
            "collective volumes parsed from the optimized HLO of the "
            "jitted train step on the release (data=4, fsdp=4) mesh; "
            "virtual CPU devices, so step_s is not a throughput number"
        ),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1), flush=True)


if __name__ == "__main__":
    main()
