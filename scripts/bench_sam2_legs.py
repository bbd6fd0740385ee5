"""SAM2 primary-metric legs for bench.py, as one subprocess.

Measures (a) memory-propagated tracking — the reference's only recorded
number (27 fps, 768² model, ref model/sam2.py:3783-3785) — and (b) the
batched no-memory language decode (the real UniGR eval hot path, ref
sam2.py:4095-4100), with analytic-FLOPs MFU for both. bench.py runs
this in a subprocess like its other legs so a relay death inside the
SAM2 measurement cannot erase legs that already completed
(evidence-durability follow-up to VERDICT r3 "what's weak" #1).

Env knobs (kernel A/B experiments): RGA3_FUSED_BLOCK_Q_SMALL/_LARGE,
RGA3_NO_SPLIT, RGA3_FUSED_TRANSITION, RGA3_BENCH_TRACK_FRAMES,
RGA3_BENCH_FRAMES.

Prints one JSON line: {"track_fps", "mfu", "decode_fps", "decode_mfu"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rga3_tpu.models.sam2 import SAM2_HIERA_L
    from rga3_tpu.models.sam2.model import Sam2Model
    from rga3_tpu.models.sam2.video import track_video
    from rga3_tpu.utils.flops import (
        sam2_decode_frame_flops, sam2_track_step_flops,
    )
    from rga3_tpu.utils.profiling import mfu

    cfg = SAM2_HIERA_L
    bq = os.environ.get("RGA3_FUSED_BLOCK_Q_SMALL")
    if bq:  # kernel-tuning experiments only; default is the tuned value
        cfg = cfg.replace(
            hiera=cfg.hiera.replace(fused_block_q_small=int(bq))
        )
    if os.environ.get("RGA3_NO_SPLIT"):  # A/B the stage-4 split fusion
        cfg = cfg.replace(
            hiera=cfg.hiera.replace(use_split_fused_block=False)
        )
    bql = os.environ.get("RGA3_FUSED_BLOCK_Q_LARGE")
    if bql:
        cfg = cfg.replace(
            hiera=cfg.hiera.replace(fused_block_q_large=int(bql))
        )
    ft = os.environ.get("RGA3_FUSED_TRANSITION")  # A/B the q-pool kernel
    if ft:
        cfg = cfg.replace(
            hiera=cfg.hiera.replace(use_fused_transition=ft != "0")
        )
    s2d = os.environ.get("RGA3_S2D_PATCH_EMBED")  # A/B the s2d embed
    if s2d:
        cfg = cfg.replace(
            hiera=cfg.hiera.replace(s2d_patch_embed=s2d != "0")
        )
    model = Sam2Model(cfg)
    rng = np.random.default_rng(0)

    T = int(os.environ.get("RGA3_BENCH_TRACK_FRAMES", "32"))
    B = int(os.environ.get("RGA3_BENCH_FRAMES", "8"))  # decode batch
    S = cfg.image_size
    track_frames = jnp.asarray(
        rng.normal(size=(T, S, S, 3)).astype(np.float32), jnp.bfloat16
    )
    lang1 = jnp.asarray(
        rng.normal(size=(1, 1, cfg.d_model)).astype(np.float32),
        jnp.bfloat16,
    )

    # shapes via eval_shape (no compile); ONE jitted init graph — per-leaf
    # jnp calls would trigger hundreds of separate (slow) remote compiles.
    # The default __call__ init covers every submodule (incl. memory), so
    # both workloads share this tree.
    shapes = jax.eval_shape(
        lambda k: model.init(k, track_frames[:1], lang1),
        jax.random.PRNGKey(0),
    )

    @jax.jit
    def make_params(k):
        return jax.tree.map(
            lambda s: (jax.random.normal(k, s.shape) * 0.02).astype(
                jnp.bfloat16
            ),
            shapes,
        )

    params = make_params(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    # params passed as ARGUMENTS: closing over them would bake ~0.4GB of
    # constants into the HLO and stall the remote compiler

    # ---- workload 1: memory-propagated tracking (the 27-fps baseline) --
    @jax.jit
    def run_track(params, fr, le):
        out = track_video(model, params, fr, language_embd=le)
        return jnp.sum(out["high_res_masks"].astype(jnp.float32))

    track_c = run_track.lower(params, track_frames, lang1).compile()
    np.asarray(track_c(params, track_frames, lang1))  # warm (host fetch —
    # block_until_ready alone can return optimistically through the relay)

    def sample_track(iters: int = 4) -> float:
        # several async dispatches, ONE host fetch: the relay's ~32 ms
        # scalar round-trip otherwise counts against the first sample
        # (measured rt_probe: scalar fetch min 31 ms on this tunnel)
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            s = track_c(params, track_frames + i, lang1)
            acc = s if acc is None else acc + s
        float(np.asarray(acc))
        return (iters * T) / (time.perf_counter() - t0)

    # The chip is time-shared (~2x run-to-run noise from other tenants);
    # best-of-N is standard under external interference.
    fps_track = max(sample_track() for _ in range(5))
    # Analytic model FLOPs: XLA's cost_analysis() reports ZERO for every
    # Pallas tpu_custom_call, so with the fused/flash kernels active it
    # sees only a fraction of the real work (utils/flops.py, cross-checked
    # vs the kernel-free CPU build in tests/test_flops.py).
    flops_track = T * sam2_track_step_flops(cfg)
    mfu_track = mfu(flops_track, T / fps_track)

    # ---- workload 2: batched no-memory language decode (eval hot path) -
    dec_frames = jnp.asarray(
        rng.normal(size=(B, S, S, 3)).astype(np.float32), jnp.bfloat16
    )
    langB = jnp.asarray(
        rng.normal(size=(B, 1, cfg.d_model)).astype(np.float32),
        jnp.bfloat16,
    )

    @jax.jit
    def run_decode(params, fr, le):
        out = model.apply(
            params, fr, le, method=Sam2Model.decode_frames_with_language
        )
        return out["low_res_masks"]

    dec_c = run_decode.lower(params, dec_frames, langB).compile()
    np.asarray(dec_c(params, dec_frames, langB))

    def sample_decode(iters: int) -> float:
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            s = jnp.sum(dec_c(params, dec_frames + i, langB).astype(
                jnp.float32
            ))
            acc = s if acc is None else acc + s
        float(np.asarray(acc))  # forces completion of every iteration
        return (iters * B) / (time.perf_counter() - t0)

    fps_decode = max(sample_decode(12) for _ in range(5))
    flops_decode = B * sam2_decode_frame_flops(cfg)
    mfu_decode = mfu(flops_decode, B / fps_decode)

    print(json.dumps({
        "track_fps": round(fps_track, 2),
        "mfu": round(mfu_track, 4),
        "decode_fps": round(fps_decode, 2),
        "decode_mfu": round(mfu_decode, 4),
    }))


if __name__ == "__main__":
    main()
