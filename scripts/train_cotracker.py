"""Train CoTrackerLite on synthetic motion (models/stom/synth.py).

Stands in for the unavailable CoTracker3 checkpoint (ref model/STOM.py:18):
after training, plug into STOM via
`STOM(tracker=CoTrackerJax(model, params))`.

  python scripts/train_cotracker.py --steps 2000 --out cotracker_lite.npz
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def build_train_step(model, tx):
    import jax
    import jax.numpy as jnp

    def loss_fn(params, frames, queries, gt):
        tracks, vis = model.apply(params, frames, queries)
        err = tracks - gt
        # Huber on positions; visibility is always-on in synthetic data
        huber = jnp.where(
            jnp.abs(err) < 4.0, 0.5 * err**2, 4.0 * (jnp.abs(err) - 2.0)
        )
        pos_loss = huber.mean()
        vis_loss = jnp.mean(
            jnp.maximum(vis, 0) - vis + jnp.log1p(jnp.exp(-jnp.abs(vis)))
        )  # BCE with target 1
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rga3_tpu.models.stom.cotracker import CoTrackerLite
    from rga3_tpu.models.stom.synth import make_synthetic_batch

    model = (
        CoTrackerLite(dim=64, heads=4, depth=1, num_scales=2, iterations=2)
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
    step = build_train_step(model, tx)

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

    from rga3_tpu.models.stom.cotracker import save_params

    flat, _ = jax.flatten_util.ravel_pytree(params)
    save_params(args.out, params)
    print(f"saved {args.out} ({flat.size} params)")


if __name__ == "__main__":
    main()
