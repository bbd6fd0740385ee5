"""Fixed synthetic point-tracking benchmark (smooth / large-motion /
occlusion), VERDICT r2 item 6.

Scores STOM tracker backends on the deterministic suite in
models/stom/synth.py (fixed seeds, px error over GT-visible points,
stay-put baseline per case). Runs on CPU (LK) or chip (jitted nets).

  python scripts/bench_stom_synth.py --backend lk
  python scripts/bench_stom_synth.py --backend lite --ckpt ct_lite.msgpack
  python scripts/bench_stom_synth.py --backend cotracker3 --tiny \
      --ckpt ct3_tiny.msgpack
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend",
                   choices=["lk", "lite", "cotracker3", "shipped"],
                   default="shipped",
                   help="shipped = the in-repo trained CoTracker3-small "
                   "weights (STOM's default backend); falls back to lk "
                   "if the weight file is absent")
    p.add_argument("--ckpt", default=None,
                   help="trained params (models/stom/cotracker.save_params "
                   "format); random init without it")
    p.add_argument("--weights", default=None,
                   help="explicit self-describing CoTracker3 npz for the "
                   "shipped backend (e.g. runs/ct3_official.npz)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny net config (matches train_cotracker --tiny)")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--points", type=int, default=16)
    p.add_argument("--suite",
                   choices=["fixed", "serving", "serving-photo"],
                   default="fixed",
                   help="fixed = the 64^2 smooth/large/occlusion cases; "
                   "serving = layered parallax clips at the 160x224 STOM "
                   "serving resolution (benchmark_tracker_serving); "
                   "serving-photo = same geometry with real photographic "
                   "textures (out-of-family for the noise-trained "
                   "trackers)")
    args = p.parse_args()

    import numpy as np

    from rga3_tpu.models.stom.synth import (
        benchmark_tracker, benchmark_tracker_serving,
    )

    if args.backend == "shipped":
        from rga3_tpu.models.stom.cotracker3 import shipped_tracker

        backend = shipped_tracker(path=args.weights,
                                  max_points=args.points)
        if backend is None:
            print("# no shipped weights; falling back to lk",
                  file=sys.stderr)
            args.backend = "lk"
    if args.backend == "lk":
        from rga3_tpu.models.stom.tracker import LKTracker

        backend = LKTracker()
    elif args.backend != "shipped":
        import jax
        import jax.numpy as jnp

        if args.backend == "lite":
            from rga3_tpu.models.stom.cotracker import (
                CoTrackerJax, CoTrackerLite, load_params,
            )

            model = (
                CoTrackerLite(dim=64, heads=4, depth=1, num_scales=2,
                              iterations=2)
                if args.tiny else CoTrackerLite()
            )
            params = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((args.frames, args.size, args.size, 3)),
                jnp.zeros((args.points, 3)),
            )
            if args.ckpt:
                params = load_params(args.ckpt, params)
            backend = CoTrackerJax(model, params)
        else:
            import dataclasses

            from rga3_tpu.models.stom.cotracker import load_params
            from rga3_tpu.models.stom.cotracker3 import (
                CoTracker3Offline, CoTracker3Predictor,
                cotracker3_offline_config, tiny_cotracker3_config,
            )

            cfg = (
                tiny_cotracker3_config() if args.tiny
                else cotracker3_offline_config()
            )
            cfg = dataclasses.replace(
                cfg, model_resolution=(args.size, args.size)
            )
            model = CoTracker3Offline(cfg)
            params = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((args.frames, args.size, args.size, 3)),
                jnp.zeros((args.points, 3)),
            )
            if args.ckpt:
                params = load_params(args.ckpt, params)
            backend = CoTracker3Predictor(
                params, model, max_points=args.points
            )

    def track_fn(frames_u8, pts0, qidx):
        tracks, _vis = backend.track_points(list(frames_u8), pts0, qidx)
        return tracks

    if args.suite in ("serving", "serving-photo"):
        report = benchmark_tracker_serving(
            track_fn, t=args.frames, n_points=args.points,
            texture="photo" if args.suite == "serving-photo" else "noise",
        )
    else:
        report = benchmark_tracker(
            track_fn, t=args.frames, size=args.size, n_points=args.points
        )
    print(json.dumps({
        "backend": args.backend,
        "ckpt": bool(args.ckpt),
        "tiny": args.tiny,
        "suite": args.suite,
        **report,
    }))


if __name__ == "__main__":
    main()
