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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--points", type=int, default=16)
    p.add_argument("--out", default="cotracker_lite.npz")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--arch", choices=["lite", "cotracker3"], default="lite")
    args = p.parse_args()

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
