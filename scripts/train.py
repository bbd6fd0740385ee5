"""UniGR joint training driver (TPU-native rebuild of ref train_joint.py).

Replaces the torchrun/DeepSpeed runtime (ref: train_joint.py:127-648) with:
mesh + pjit sharding (ZeRO-equivalent), optax AdamW + warmup-cosine-floor,
lax.scan grad accumulation, Orbax checkpoints with auto-resume, TensorBoard
scalars, and a ReasonSeg-val gIoU/cIoU loop.

Usage (release-config equivalent of run_torchrun.sh):
  python scripts/train.py --model_dir /path/to/Qwen2.5-VL-7B-Instruct \
      --sam_pretrained /path/to/sam2_hiera_large.pt \
      --dataset_dir ./data --config configs/release_7b.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _check_u8(frames: np.ndarray) -> np.ndarray:
    """SAM frames must reach the device as uint8 so
    ops.resize.sam_normalize_maybe fires on device; a float array here
    means something upstream normalized (fine) or cast raw pixels
    (silent garbage) — only uint8 keeps both the bytes and the numerics."""
    if frames.dtype != np.uint8:
        raise TypeError(
            f"images_sam dtype {frames.dtype} — the data layer emits "
            "uint8 SAM frames; do not cast on host (device normalization "
            "would be skipped)."
        )
    return frames


def assemble_params(model, cfg, tree, param_dtype="float32"):
    """Host-side param assembly: pretrained leaves from `tree`, missing
    leaves initialized deterministically (crc32-seeded so every host in
    a multi-host launch builds identical params without collectives)."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda k: model.init(
            k,
            jnp.zeros((1, cfg.sam2.image_size, cfg.sam2.image_size, 3)),
            jnp.zeros((1, 1, cfg.seg.out_dim)),
            jnp.zeros((1, 8), jnp.int32),
        ),
        jax.random.PRNGKey(0),
    )["params"]

    def fill(shape_leaf, path):
        node = tree
        for k in path[:-1]:
            node = node.get(k, {}) if isinstance(node, dict) else {}
        leaf = node.get(path[-1]) if isinstance(node, dict) else None
        if leaf is not None and tuple(np.shape(leaf)) == tuple(shape_leaf.shape):
            return np.asarray(leaf, np.float32)
        # zlib.crc32, not hash(): str hash is salted per process, and
        # every host must initialize identical params (multi-host SPMD)
        import zlib

        rng = np.random.default_rng(zlib.crc32("/".join(path).encode()))
        if path[-1].endswith("lora_b") or "bias" in path[-1]:
            return np.zeros(shape_leaf.shape, np.float32)
        if path[-1] in ("scale", "g_weight"):
            # norm scales / layer-scale gains start at 1 (the flax
            # default): N(0, 0.02) here collapses activations ~50x per
            # layer — at 36 bf16 layers they underflow to exact zero and
            # the next RMSNorm divides 0/0 (NaN from step 0)
            return np.ones(shape_leaf.shape, np.float32)
        return rng.normal(0, 0.02, shape_leaf.shape).astype(np.float32)

    def walk(shapes_node, path=()):
        if isinstance(shapes_node, dict):
            return {k: walk(v, path + (k,)) for k, v in shapes_node.items()}
        return fill(shapes_node, list(path))

    from flax.core import meta

    params = {"params": walk(meta.unbox(shapes))}
    if param_dtype == "bfloat16":
        import ml_dtypes

        params = jax.tree.map(
            lambda a: a.astype(ml_dtypes.bfloat16), params
        )
    return params


def parse_args():
    p = argparse.ArgumentParser("rga3_tpu UniGR training")
    p.add_argument("--model_dir", required=True,
                   help="HF Qwen2.5-VL dir (weights + tokenizer)")
    p.add_argument("--sam_pretrained", default=None,
                   help="sam2_hiera_large.pt path")
    p.add_argument("--dataset_dir", default="./data")
    p.add_argument("--ckpt_dir", default="runs/unigr")
    p.add_argument("--model_size", choices=["3b", "7b", "tiny"],
                   default="7b")
    p.add_argument("--dataset", default="sem_seg,refer_seg,vqa,reason_seg")
    p.add_argument("--sample_rates", default="9,3,3,1")
    p.add_argument("--remat", choices=["full", "dots", "none"],
                   default="dots",
                   help="LM activation strategy (chip A/B at the release "
                   "micro-batch: dots MFU 0.414 vs none 0.393 vs full "
                   "~0.36; full trades speed for least HBM)")
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--steps_per_epoch", type=int, default=100)
    p.add_argument("--micro_batch_size", type=int, default=2)
    p.add_argument("--grad_accum_steps", type=int, default=8)
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--lora_r", type=int, default=128)
    p.add_argument("--lora_alpha", type=float, default=256.0)
    p.add_argument("--num_frames_mllm", type=int, default=8)
    p.add_argument("--num_frames_sam", type=int, default=4)
    p.add_argument("--mask_res", type=int, default=256)
    p.add_argument("--ce_loss_weight", type=float, default=1.0)
    p.add_argument("--dice_loss_weight", type=float, default=0.5)
    p.add_argument("--bce_loss_weight", type=float, default=2.0)
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=0,
                   help="0 = all remaining devices")
    p.add_argument("--mesh_tensor", type=int, default=1)
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--no_auto_resume", dest="auto_resume",
                   action="store_false")
    p.add_argument("--precision", default="bfloat16")
    p.add_argument("--param_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="master-param storage dtype. bfloat16 halves "
                   "param HBM (what lets a full 3B train step fit one "
                   "v5e chip, like bench_train) at coarser update "
                   "granularity — use float32 for converging runs on "
                   "enough devices")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--data_workers", type=int, default=2,
                   help="prefetch threads (0 = synchronous). With >=1 "
                   "worker, batch COMPOSITION is not reproducible for a "
                   "given seed: workers sample the hybrid dataset through "
                   "shared RNG state, so ordering depends on thread "
                   "scheduling. Use 0 when debugging needs exact replay.")
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--no_eval", action="store_true",
                   help="skip the per-epoch ReasonSeg-val gIoU/cIoU loop")
    p.add_argument("--val_at_start", action="store_true",
                   help="also run the val loop BEFORE step 0 (baseline "
                   "for learning-trajectory evidence)")
    p.add_argument("--val_samples", type=int, default=200)
    # multi-host launch (ref torchrun --nnodes/--node_rank/--master_addr,
    # run_torchrun.sh:6-23); also read from COORDINATOR_ADDRESS /
    # NUM_PROCESSES / PROCESS_ID env vars
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (enables jax.distributed)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--local_devices", type=int, default=None,
                   help="force N virtual host devices (CPU testing)")
    p.add_argument("--platform", default=None,
                   help="jax platform override, e.g. cpu (testing)")
    p.add_argument("--loss_log", default=None,
                   help="write per-step loss JSON here (rank 0)")
    p.add_argument("--config", default=None,
                   help="JSON config file; CLI flags override")
    args = p.parse_args()
    if args.config:
        with open(args.config) as f:
            overrides = json.load(f)
        for k, v in overrides.items():
            if k.startswith("_"):
                continue
            if hasattr(args, k) and f"--{k}" not in sys.argv:
                setattr(args, k, v)
    return args


def main():
    args = parse_args()
    # multi-host init must precede any other jax use (ref NCCL pg init
    # before model build, train_joint.py:132-134)
    from rga3_tpu.parallel.distributed import (
        broadcast_scalar, init_distributed, put_global, replicate_to_host,
    )

    proc_id = init_distributed(
        args.coordinator_address, args.num_processes, args.process_id,
        local_device_count=args.local_devices, platform=args.platform,
    )
    is_main = proc_id == 0

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rga3_tpu.config import MeshConfig, SegHeadConfig, TrainConfig
    from rga3_tpu.data.collate import collate
    from rga3_tpu.data.datasets import ImgVidHybridDataset
    from rga3_tpu.data.processor import QwenVLProcessor
    from rga3_tpu.models.qwen25vl import (
        QWEN25_VL_3B, QWEN25_VL_7B, tiny_config,
    )
    from rga3_tpu.models.qwen25vl.loader import load_qwen25vl_params
    from rga3_tpu.models.sam2 import SAM2_HIERA_L, tiny_sam2_config
    from rga3_tpu.models.sam2.loader import load_sam2_params
    from rga3_tpu.models.unigr import UniGR, UniGRConfig
    from rga3_tpu.parallel.mesh import make_mesh
    from rga3_tpu.train.checkpoints import CheckpointManager
    from rga3_tpu.train.step import build_train_step, make_train_state
    from rga3_tpu.utils.meters import AverageMeter, ProgressMeter

    n_dev = jax.device_count()  # GLOBAL device count across all hosts
    fsdp = args.mesh_fsdp or (n_dev // (args.mesh_data * args.mesh_tensor))
    mesh = make_mesh(
        MeshConfig(data=args.mesh_data, fsdp=fsdp, tensor=args.mesh_tensor)
    )
    n_proc = jax.process_count()
    if is_main:
        print(f"mesh: {dict(mesh.shape)} over {n_proc} process(es)",
              flush=True)

    # ---- processor & tokenizer (adds [SEG]) ----
    processor = QwenVLProcessor.from_pretrained(args.model_dir)
    seg_token_id = processor.seg_token_id

    # ---- model config ----
    qcfg = {"3b": QWEN25_VL_3B, "7b": QWEN25_VL_7B,
            "tiny": tiny_config()}[args.model_size]
    qcfg = qcfg.replace(
        text=qcfg.text.replace(
            lora_rank=args.lora_r, lora_alpha=args.lora_alpha,
            # scan-over-layers keeps the XLA graph small for the big models
            scan_layers=args.model_size != "tiny",
        )
    )
    scfg = SAM2_HIERA_L if args.model_size != "tiny" else tiny_sam2_config()
    cfg = UniGRConfig(
        qwen=qcfg,
        sam2=scfg,
        seg=SegHeadConfig(
            out_dim=scfg.d_model,  # [SEG] projection targets SAM prompt dim
            seg_token_id=seg_token_id,
            ce_loss_weight=args.ce_loss_weight,
            dice_loss_weight=args.dice_loss_weight,
            bce_loss_weight=args.bce_loss_weight,
        ),
    )
    model = UniGR(cfg, remat=args.remat)

    # ---- params: load pretrained, init the rest ----
    tree = {}
    if args.model_dir != "dummy":
        print("loading pretrained weights...", flush=True)
        try:
            loaded = load_qwen25vl_params(args.model_dir)["params"]
            if qcfg.text.scan_layers:
                from rga3_tpu.models.qwen25vl.loader import (
                    stack_qwen_layers,
                )

                loaded = stack_qwen_layers({"params": loaded})["params"]
            tree["qwen"] = loaded
        except FileNotFoundError:
            print("no safetensors found — random-initializing the LLM",
                  flush=True)
    if args.sam_pretrained:
        tree["grounding_encoder"] = load_sam2_params(
            args.sam_pretrained
        )["params"]
    # init missing leaves (lora, seg head, anything not in checkpoints)
    t0 = time.time()
    params = assemble_params(model, cfg, tree, args.param_dtype)
    print(f"params assembled in {time.time()-t0:.1f}s", flush=True)

    # ---- data ----
    train_ds = ImgVidHybridDataset(
        args.dataset_dir,
        datasets=args.dataset.split(","),
        sample_rates=[float(x) for x in args.sample_rates.split(",")],
        samples_per_epoch=(
            args.steps_per_epoch * args.grad_accum_steps
            * args.micro_batch_size * max(mesh.shape.get("data", 1), 1)
        ),
        num_frames_mllm=args.num_frames_mllm,
        num_frames_sam=args.num_frames_sam,
        mask_res=args.mask_res,
        sam_size=cfg.sam2.image_size,
    )

    # ---- train state ----
    tcfg = TrainConfig(
        lr=args.lr, epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        micro_batch_size=args.micro_batch_size,
        grad_accum_steps=args.grad_accum_steps,
        lora_r=args.lora_r, lora_alpha=args.lora_alpha,
        ckpt_dir=args.ckpt_dir,
        remat=args.remat,
    )
    with mesh:
        state, tx = make_train_state(tcfg, params, mesh)

        vl_keys = ["hpos", "wpos", "window_seg", "grid_seg",
                   "win_pad", "win_unpad",
                   "token_perm", "merged_reverse"]

        def loss_fn(p, batch):
            vision_layout = None
            pixel_patches = batch.get("pixel_patches")
            if pixel_patches is not None:
                vision_layout = {k: batch[f"vl_{k}"] for k in vl_keys}
            return model.apply(
                p,
                batch["input_ids"], batch["labels"],
                batch["position_ids"], batch["segment_ids"],
                batch["images_sam"], batch["gt_masks"],
                batch["masks_valid"],
                pixel_patches=pixel_patches,
                vision_layout=vision_layout,
                compute_dtype=jnp.bfloat16,
                method=UniGR.train_forward,
            )

        step_fn = build_train_step(
            loss_fn, tx, grad_accum_steps=args.grad_accum_steps
        )

        ckpt = CheckpointManager(args.ckpt_dir)
        start_epoch = ckpt.resume_epoch() if args.auto_resume else 0
        if start_epoch > 0:
            if is_main:
                print(f"resuming from epoch {start_epoch}", flush=True)
            state = ckpt.restore("latest", state)

        writer = None  # rank-0 only (ref train_joint.py:140-145)
        if is_main:
            try:
                from torch.utils.tensorboard import SummaryWriter

                writer = SummaryWriter(os.path.join(args.ckpt_dir, "tb"))
            except Exception:
                pass

        def batch_axis_spec(size):
            """Largest mesh-axis combo that divides the batch size."""
            d, fs = mesh.shape.get("data", 1), mesh.shape.get("fsdp", 1)
            if d * fs > 1 and size % (d * fs) == 0:
                return ("data", "fsdp")
            if d > 1 and size % d == 0:
                return "data"
            if fs > 1 and size % fs == 0:
                return "fsdp"
            return None

        def stage(batch_np):
            """Host batch -> global sharded arrays. Every host assembles
            the full batch deterministically (sample_global), feeds only
            its local rows of the batch-sharded arrays
            (jax.make_array_from_process_local_data inside put_global),
            and replicates the vision arrays (token order is global
            across the batch, not per-shard)."""
            out = {}
            for k, v in batch_np.items():
                spec = [None] * (v.ndim)
                if k == "position_ids":
                    spec[2] = batch_axis_spec(v.shape[2])
                elif not (k == "pixel_patches" or k.startswith("vl_")):
                    spec[1] = batch_axis_spec(v.shape[1])
                out[k] = put_global(mesh, P(*spec), v)
            return out

        micro = args.micro_batch_size * max(mesh.shape.get("data", 1), 1)
        # static vision-token budget: per-frame patch cap (video pixel
        # budget / 14^2) x temporal groups x micro batch, in merge units
        per_frame_patches = (320 * 28 * 28) // (14 * 14)  # 1280
        vision_budget = (
            micro * max(args.num_frames_mllm // 2, 1) * per_frame_patches
        )
        vision_budget = -(-vision_budget // 4) * 4
        def make_accum_batch(batch_idx):
            """Accumulation batch `batch_idx` — identical on every host
            (content is a pure function of the global sample index)."""
            micro_batches = []
            batch_idx += start_epoch * args.steps_per_epoch  # resume offset
            for a in range(args.grad_accum_steps):
                base = (batch_idx * args.grad_accum_steps + a) * micro
                samples = [
                    train_ds.sample_global(base + r) for r in range(micro)
                ]
                c = collate(
                    samples, processor, cfg.qwen,
                    vision_budget_tokens=vision_budget,
                )
                mb = {
                    "input_ids": c["input_ids"],
                    "labels": c["labels"],
                    "position_ids": c["position_ids"],
                    "segment_ids": c["attention_mask"].astype(np.int32),
                    # ship uint8 — Sam2Model.forward_image ImageNet-
                    # normalizes on device (bit-identical to the host
                    # path; casting to f32 here would skip it and train
                    # on raw 0-255 pixels)
                    "images_sam": _check_u8(c["images_sam"]),
                    "gt_masks": c["gt_masks"],
                    "masks_valid": c["masks_valid"],
                }
                if "pixel_patches" in c:
                    mb["pixel_patches"] = c["pixel_patches"]
                    for k, v in c["vision_layout"].items():
                        mb[f"vl_{k}"] = v
                micro_batches.append(mb)
            # pad text-length variation across micro-batches before
            # stacking on the accumulation axis
            max_l = max(m["input_ids"].shape[1] for m in micro_batches)
            max_gh = max(m["gt_masks"].shape[2] for m in micro_batches)
            max_gw = max(m["gt_masks"].shape[3] for m in micro_batches)
            for m in micro_batches:
                l = m["input_ids"].shape[1]
                if l < max_l:
                    pad = max_l - l
                    m["input_ids"] = np.pad(
                        m["input_ids"], ((0, 0), (0, pad)),
                        constant_values=151643,
                    )
                    m["labels"] = np.pad(
                        m["labels"], ((0, 0), (0, pad)),
                        constant_values=-100,
                    )
                    m["segment_ids"] = np.pad(
                        m["segment_ids"], ((0, 0), (0, pad))
                    )
                    m["position_ids"] = np.pad(
                        m["position_ids"],
                        ((0, 0), (0, 0), (0, pad)),
                    )
                gh, gw = m["gt_masks"].shape[2:]
                if gh < max_gh or gw < max_gw:
                    m["gt_masks"] = np.pad(
                        m["gt_masks"],
                        ((0, 0), (0, 0), (0, max_gh - gh),
                         (0, max_gw - gw)),
                    )
            batch = {
                k: np.stack([m[k] for m in micro_batches])
                for k in micro_batches[0]
            }
            return batch

        from rga3_tpu.data.prefetch import PrefetchLoader

        # buffer_size 2: one accumulation batch of 1024^2 SAM frames is
        # hundreds of MB of host RAM — bound queued + in-flight batches
        loader = PrefetchLoader(
            make_accum_batch, num_workers=args.data_workers, buffer_size=2,
            indexed=True,
        )
        def run_val(epoch_label):
            """ReasonSeg-val gIoU/cIoU (ref train_joint.py:586-648): all
            hosts all-gather the params; rank 0 runs the loop on its
            local devices, then broadcasts the metric so every rank
            agrees on is-best. Returns the global gIoU (or None)."""
            try:
                from rga3_tpu.evaluation.image_seg_eval import (
                    run_reason_seg_val,
                )
                from rga3_tpu.evaluation.segmentor import UniGRSegmentor

                val_params = replicate_to_host(
                    {"params": state.params["params"]}, mesh
                )
                scores = None
                if is_main:
                    seg = UniGRSegmentor(
                        model, val_params,
                        processor,
                        num_frames_mllm=args.num_frames_mllm,
                        compute_dtype=jnp.bfloat16,
                    )
                    scores = run_reason_seg_val(
                        seg, args.dataset_dir,
                        max_samples=args.val_samples,
                    )
                    print(f"val {epoch_label}: {scores}", flush=True)
                    if writer and isinstance(epoch_label, int):
                        writer.add_scalar("val/gIoU", scores["gIoU"],
                                          epoch_label)
                        writer.add_scalar("val/cIoU", scores["cIoU"],
                                          epoch_label)
                return broadcast_scalar(
                    scores["gIoU"] if scores else None
                )
            except FileNotFoundError:
                return broadcast_scalar(None)
            except Exception as e:
                print(f"val skipped: {e}", flush=True)
                return broadcast_scalar(None)

        global_step = start_epoch * args.steps_per_epoch
        loss_trace = []
        if args.val_at_start and not args.no_eval:
            # pre-training baseline: the number epoch-N gIoU must beat
            # for the run to demonstrate learning
            run_val("step0")
        for epoch in range(start_epoch, args.epochs):
            meters = {
                k: AverageMeter(k)
                for k in ["loss", "ce_loss", "mask_bce_loss",
                          "mask_dice_loss"]
            }
            t_epoch = time.time()
            for it in range(args.steps_per_epoch):
                batch = next(loader)
                state, aux = step_fn(state, stage(batch))
                # aux scalars are SPMD-global: identical on every host,
                # no extra all-reduce needed (ref AverageMeter.all_reduce
                # existed because torch losses were per-rank)
                for k, m in meters.items():
                    m.update(float(aux[k]))
                global_step += 1
                if args.loss_log:
                    loss_trace.append(float(aux["loss"]))
                if it % args.log_every == 0 and is_main:
                    ProgressMeter(
                        args.steps_per_epoch, list(meters.values()),
                        prefix=f"epoch {epoch} ",
                    ).display(it)
                    if writer:
                        for k, m in meters.items():
                            writer.add_scalar(
                                f"train/{k}", m.val, global_step
                            )
            if is_main:
                print(
                    f"epoch {epoch} done in {time.time()-t_epoch:.0f}s",
                    flush=True,
                )

            # per-epoch ReasonSeg-val gIoU/cIoU (ref train_joint.py:586-648)
            metric = None
            if not args.no_eval:
                metric = run_val(epoch)
            # all ranks save their shards of the global arrays (Orbax);
            # meta/rmtree are rank-0 inside the manager
            is_best = ckpt.save_epoch(state, epoch, metric=metric)
            if is_best and is_main:
                print(f"epoch {epoch}: new best", flush=True)

        loader.close()
        if args.loss_log and is_main:
            with open(args.loss_log, "w") as f:
                json.dump({"loss": loss_trace}, f)

    if is_main:
        print("training complete", flush=True)


if __name__ == "__main__":
    main()
