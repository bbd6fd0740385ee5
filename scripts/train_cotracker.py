"""Train a point tracker on synthetic motion (models/stom/synth.py).

Stands in for the unavailable CoTracker3 checkpoint (ref model/STOM.py:18):
after training, plug into STOM via
`STOM(tracker=CoTrackerJax(model, params))` (lite) or
`STOM(tracker=CoTracker3Predictor(params, model))` (cotracker3).

  python scripts/train_cotracker.py --steps 2000 --out cotracker_lite.npz
  python scripts/train_cotracker.py --arch cotracker3 --steps 500 \
      --out cotracker3_synth.npz

--arch cotracker3 trains the official-architecture model
(models/stom/cotracker3.py) with the standard CoTracker objective:
per-iteration Huber on tracks weighted gamma^(I-1-i), BCE on the
visibility/confidence logits (always-visible synthetic data).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _bce_ones(logits):
    import jax.numpy as jnp

    # BCE with target 1, numerically stable
    return jnp.mean(
        jnp.maximum(logits, 0) - logits
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _huber(err):
    import jax.numpy as jnp

    return jnp.where(
        jnp.abs(err) < 4.0, 0.5 * err**2, 4.0 * (jnp.abs(err) - 2.0)
    )


def _bce(logits, target):
    import jax.numpy as jnp

    # numerically stable BCE with arbitrary {0,1} targets
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def build_train_step(model, tx, arch: str = "lite", gamma: float = 0.8):
    import jax
    import jax.numpy as jnp

    def loss_fn(params, frames, queries, gt):
        if arch == "cotracker3":
            # model expects [0, 255] input; supervise every refinement
            # iteration, later iterations weighted higher (CoTracker
            # training objective)
            out = model.apply(params, frames * 255.0, queries)
            tracks = out["tracks"]  # (I, T, N, 2)
            iters = tracks.shape[0]
            w = gamma ** jnp.arange(iters - 1, -1, -1, dtype=jnp.float32)
            per_iter = _huber(tracks - gt[None]).mean(axis=(1, 2, 3))
            pos_loss = jnp.sum(w * per_iter) / jnp.sum(w)
            vis_loss = _bce_ones(out["vis"]) + _bce_ones(out["conf"])
            return pos_loss + 0.1 * vis_loss, per_iter[-1]
        tracks, vis = model.apply(params, frames, queries)
        pos_loss = _huber(tracks - gt).mean()
        vis_loss = _bce_ones(vis)
        return pos_loss + 0.1 * vis_loss, pos_loss

    @jax.jit
    def step(params, opt_state, frames, queries, gt):
        (loss, pos_loss), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, frames, queries, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pos_loss

    return step


def build_train_step_occl(model, tx, gamma: float = 0.8,
                          conf_thr: float = 6.0):
    """CoTracker3 training step on the layered occlusion curriculum:
    batched clips (vmapped apply), per-iteration Huber on ALL points
    (supervising hidden points through occlusion is what teaches the
    whole-clip attention to re-acquire them — ref model/STOM.py:59-65
    backward_tracking exists for exactly this), TRUE-visibility BCE on
    the vis head, and CoTracker's confidence target on the conf head
    (prediction within conf_thr px of GT)."""
    import jax
    import jax.numpy as jnp

    def loss_fn(params, frames, queries, gt, vis_gt):
        # frames arrive uint8 (4x less host->device relay traffic than
        # f32; the model casts and normalizes on device)
        out = jax.vmap(
            lambda f, q: model.apply(params, f, q)
        )(frames, queries)
        tracks = out["tracks"]  # (B, I, T, N, 2)
        iters = tracks.shape[1]
        w = gamma ** jnp.arange(iters - 1, -1, -1, dtype=jnp.float32)
        err = _huber(tracks - gt[:, None])       # (B, I, T, N, 2)
        per_iter = err.mean(axis=(0, 2, 3, 4))   # (I,)
        pos_loss = jnp.sum(w * per_iter) / jnp.sum(w)
        visf = vis_gt.astype(jnp.float32)
        vis_loss = _bce(out["vis"], visf)
        dist = jnp.linalg.norm(
            tracks[:, -1] - gt, axis=-1
        )                                        # (B, T, N)
        close = (dist < conf_thr).astype(jnp.float32)
        conf_loss = _bce(out["conf"], jax.lax.stop_gradient(close))
        # final-iteration px error on visible / hidden points (aux only)
        vis_px = jnp.sum(dist * visf) / jnp.maximum(jnp.sum(visf), 1)
        hidf = 1.0 - visf
        hid_px = jnp.sum(dist * hidf) / jnp.maximum(jnp.sum(hidf), 1)
        loss = pos_loss + 0.1 * (vis_loss + conf_loss)
        return loss, (vis_px, hid_px)

    @jax.jit
    def step(params, opt_state, frames, queries, gt, vis_gt):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames, queries, gt, vis_gt
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


def train_layered(args):
    """CoTracker3 on the layered occlusion curriculum (VERDICT r3 item 2:
    the shipped tracker must survive occlusion — LK chained flow never
    re-acquires, 11.5 px mean / 18.3 px hidden on bench_stom_synth)."""
    import queue as queue_mod
    import threading

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rga3_tpu.models.stom.cotracker import load_params
    from rga3_tpu.models.stom.cotracker3 import (
        CoTracker3Offline, cotracker3_offline_config,
        cotracker3_small_config, save_cotracker3, tiny_cotracker3_config,
    )
    from rga3_tpu.models.stom.synth import (
        benchmark_tracker, make_training_clip,
    )

    assert args.arch == "cotracker3", "--curriculum layered needs cotracker3"
    import dataclasses

    cfg = {
        "tiny": tiny_cotracker3_config,
        "small": cotracker3_small_config,
        "official": cotracker3_offline_config,
    }[args.preset]()
    if args.tiny:
        cfg = tiny_cotracker3_config()
    h, w = cfg.model_resolution
    if args.size:
        h, w = args.size, args.width or args.size
    cfg = dataclasses.replace(
        cfg,
        model_resolution=(h, w),
        iters=args.train_iters or cfg.iters,
        compute_dtype="bfloat16" if args.bf16 else cfg.compute_dtype,
    )
    model = CoTracker3Offline(cfg)

    B, T, N = args.batch, args.frames, args.points
    gen_rng = np.random.default_rng(0)

    def make_clip(rng):
        tex = args.textures
        if tex == "mixed":
            tex = "photo" if rng.random() < 0.5 else "noise"
        f, qr, g, v = make_training_clip(
            rng, t=T, h=h, w=w, n_points=N,
            max_speed=args.max_speed,
            occluder_prob=args.occluder_prob,
            speed_exponent=args.speed_exponent,
            texture=tex,
        )
        # uint8 pool: 4x less RAM and 4x less relay traffic per step
        return (
            np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8), qr, g, v
        )

    # Host-side clip synthesis (~0.13 s/clip at 160x224) cannot feed the
    # device step on this 1-CPU host, so fresh clips stream into a
    # replay POOL and each step samples its batch from the pool: the
    # device never blocks on generation, and each synthetic clip is
    # reused ~pool-turnover times (harmless — the generator's clip space
    # is effectively infinite, reuse just reshuffles batch composition).
    pool: list = []
    pool_size = max(args.pool_size, 2 * B)
    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=8)
    stop = threading.Event()

    def producer():
        while not stop.is_set():
            clip = make_clip(gen_rng)
            while not stop.is_set():
                try:
                    q.put(clip, timeout=1.0)
                    break
                except queue_mod.Full:
                    continue

    th = threading.Thread(target=producer, daemon=True)
    th.start()

    fresh_count = 0

    def next_batch(rng):
        nonlocal fresh_count
        # drain whatever the producer has ready (block only while the
        # pool is still too small to sample a batch)
        while True:
            try:
                clip = q.get(block=len(pool) < pool_size // 2)
                fresh_count += 1
                if len(pool) < pool_size:
                    pool.append(clip)
                else:
                    pool[int(rng.integers(len(pool)))] = clip
            except queue_mod.Empty:
                break
        idx = rng.choice(len(pool), size=B, replace=len(pool) < B)
        fs, qs, gs, vs = zip(*(pool[i] for i in idx))
        return np.stack(fs), np.stack(qs), np.stack(gs), np.stack(vs)

    sample_rng = np.random.default_rng(7)
    frames0, queries0, _, _ = next_batch(sample_rng)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames0[0]),
        jnp.asarray(queries0[0]),
    )
    if args.resume:
        params = load_params(args.resume, params)
        print(f"resumed from {args.resume}", flush=True)
    n_params = sum(
        int(np.prod(v.shape)) for v in jax.tree.leaves(params)
    )
    print(f"cotracker3 {n_params/1e6:.1f}M params, res ({h},{w}), "
          f"iters {cfg.iters}, batch {B}", flush=True)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, min(200, args.steps // 10 + 1), args.steps
            ),
            weight_decay=1e-5,
        ),
    )
    opt_state = tx.init(params)
    # conf target: within 12 px at CoTracker's 384-row training res,
    # scaled to ours
    step = build_train_step_occl(
        model, tx, conf_thr=max(12.0 * h / 384.0, 3.0)
    )

    t0 = time.time()
    for i in range(args.steps):
        frames, queries, gt, vis = next_batch(sample_rng)
        params, opt_state, loss, (vis_px, hid_px) = step(
            params, opt_state, jnp.asarray(frames), jnp.asarray(queries),
            jnp.asarray(gt), jnp.asarray(vis),
        )
        if i % 25 == 0 or i == args.steps - 1:
            print(
                f"step {i}: loss {float(loss):.4f} "
                f"vis_px {float(vis_px):.2f} hid_px {float(hid_px):.2f} "
                f"pool {len(pool)} fresh {fresh_count} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
        if args.save_every and (
            (i + 1) % args.save_every == 0 or i == args.steps - 1
        ):
            save_cotracker3(args.out, params, cfg)
            print(f"saved {args.out} @ step {i}", flush=True)
    stop.set()

    # score on the fixed benchmark suite (the VERDICT acceptance metric)
    from rga3_tpu.models.stom.cotracker3 import CoTracker3Predictor

    pred = CoTracker3Predictor(params, model)
    report = benchmark_tracker(
        lambda f, p, i: pred.track_points(f, p, i)[0]
    )
    import json

    print("bench_stom_synth:", json.dumps(report), flush=True)
    save_cotracker3(args.out, params, cfg)
    print(f"saved {args.out}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=0,
                   help="clip height override (layered: 0 = the preset's\n                   model_resolution; flat: 0 = 64)")
    p.add_argument("--width", type=int, default=0,
                   help="clip width (0 = square --size clips)")
    p.add_argument("--points", type=int, default=16)
    p.add_argument("--out", default="cotracker_lite.npz")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--arch", choices=["lite", "cotracker3"], default="lite")
    p.add_argument(
        "--curriculum", choices=["flat", "layered"], default="flat",
        help="flat = single similarity-warped texture (always visible); "
        "layered = background + independently-moving sprites + occluders "
        "with true visibility labels (synth.make_training_clip) — the "
        "recipe that teaches occlusion re-acquisition",
    )
    p.add_argument(
        "--preset", choices=["tiny", "small", "official"], default="small",
        help="cotracker3 dims for the layered curriculum: tiny (CPU "
        "tests), small (the shipped-weights config, res 160x224), "
        "official (scaled_offline.pth dims, res 384x512)",
    )
    p.add_argument("--pool-size", type=int, default=512,
                   help="clip replay pool (layered curriculum): fresh "
                   "clips stream in from the producer thread, batches "
                   "sample from the pool so the 1-CPU host never blocks "
                   "the device step")
    p.add_argument("--batch", type=int, default=1,
                   help="clips per step (layered curriculum only; "
                   "vmapped apply)")
    p.add_argument("--train-iters", type=int, default=0,
                   help="refinement iterations during training (0 = the "
                   "config's inference count; iterations share weights, "
                   "so train/infer counts may differ — CoTracker trains "
                   "with fewer)")
    p.add_argument("--bf16", action="store_true",
                   help="compute_dtype=bfloat16 (params stay f32)")
    p.add_argument("--occluder-prob", type=float, default=0.7)
    p.add_argument("--max-speed", type=float, default=8.0)
    p.add_argument("--speed-exponent", type=float, default=1.0,
                   help="<1 biases clip speeds toward --max-speed "
                   "(large-displacement-weighted curriculum)")
    p.add_argument("--textures", choices=["noise", "photo", "mixed"],
                   default="noise",
                   help="layer texture source for the layered curriculum: "
                   "band-limited noise, real photo crops "
                   "(synth._photo_texture), or a 50/50 per-clip mix — "
                   "mixed calibrates the visibility head on smooth "
                   "photographic regions the noise family never shows")
    p.add_argument("--save-every", type=int, default=500,
                   help="checkpoint cadence (layered curriculum)")
    p.add_argument("--resume", default="",
                   help="resume params from a previous --out npz")
    args = p.parse_args()

    if args.curriculum == "layered":
        train_layered(args)
        return
    args.size = args.size or 64

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rga3_tpu.models.stom.cotracker import CoTrackerLite
    from rga3_tpu.models.stom.synth import make_synthetic_batch

    if args.arch == "cotracker3":
        from rga3_tpu.models.stom.cotracker3 import (
            CoTracker3Offline, cotracker3_offline_config,
            tiny_cotracker3_config,
        )

        cfg = (
            tiny_cotracker3_config() if args.tiny
            else cotracker3_offline_config()
        )
        import dataclasses

        # track at the synthetic clip's own resolution (no resize blur)
        cfg = dataclasses.replace(
            cfg, model_resolution=(args.size, args.size)
        )
        model = CoTracker3Offline(cfg)
    else:
        model = (
            CoTrackerLite(
                dim=64, heads=4, depth=1, num_scales=2, iterations=2
            )
            if args.tiny else CoTrackerLite()
        )
    rng = np.random.default_rng(0)
    frames, queries, gt = make_synthetic_batch(
        rng, t=args.frames, h=args.size, w=args.size, n_points=args.points
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames), jnp.asarray(queries)
    )
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, min(100, args.steps // 10 + 1), args.steps
        ),
        weight_decay=1e-5,
    )
    opt_state = tx.init(params)
    step = build_train_step(model, tx, arch=args.arch)

    t0 = time.time()
    for i in range(args.steps):
        frames, queries, gt = make_synthetic_batch(
            rng, t=args.frames, h=args.size, w=args.size,
            n_points=args.points,
        )
        params, opt_state, loss, pos_loss = step(
            params, opt_state, jnp.asarray(frames), jnp.asarray(queries),
            jnp.asarray(gt),
        )
        if i % 50 == 0 or i == args.steps - 1:
            print(
                f"step {i}: loss {float(loss):.4f} "
                f"pos {float(pos_loss):.4f} "
                f"({(time.time()-t0):.0f}s)",
                flush=True,
            )

    # held-out tracking error (fresh motions, fresh textures) vs the
    # stay-put baseline
    eval_rng = np.random.default_rng(12345)
    errs, base = [], []
    for _ in range(8):
        frames, queries, gt = make_synthetic_batch(
            eval_rng, t=args.frames, h=args.size, w=args.size,
            n_points=args.points,
        )
        if args.arch == "cotracker3":
            out = model.apply(
                params, jnp.asarray(frames) * 255.0, jnp.asarray(queries)
            )
            tracks = np.asarray(out["tracks"][-1])
        else:
            tracks = np.asarray(
                model.apply(
                    params, jnp.asarray(frames), jnp.asarray(queries)
                )[0]
            )
        errs.append(np.linalg.norm(tracks - gt, axis=-1).mean())
        base.append(
            np.linalg.norm(gt - gt[0][None], axis=-1).mean()
        )
    print(
        f"held-out error {np.mean(errs):.2f} px "
        f"(stay-put baseline {np.mean(base):.2f} px)"
    )

    from rga3_tpu.models.stom.cotracker import save_params

    flat, _ = jax.flatten_util.ravel_pytree(params)
    save_params(args.out, params)
    print(f"saved {args.out} ({flat.size} params)")


if __name__ == "__main__":
    main()
