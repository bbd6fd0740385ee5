"""Benchmark: SAM2 (Hiera-L, 1024²) language-prompted video segmentation
throughput on one TPU chip.

This is the reference's eval hot path (SURVEY.md §3.2): the per-frame
`propagate_in_video` loop. The reference's own recorded number is the
upstream SAM2 comment — 27 fps tracking one object (768² model, GPU state;
ref model/sam2.py:3783-3785, BASELINE.md). We run the full Hiera-L at
1024² (more work per frame than the 768² baseline) with frames batched
through one jitted call.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BASELINE_FPS = 27.0  # ref model/sam2.py:3783-3785 (768² model, 1 object)


def main():
    import jax
    import jax.numpy as jnp

    from rga3_tpu.models.sam2 import SAM2_HIERA_L
    from rga3_tpu.models.sam2.model import Sam2Model

    cfg = SAM2_HIERA_L
    model = Sam2Model(cfg)
    rng = np.random.default_rng(0)

    B = 4  # frames per jitted call
    frames = jnp.asarray(
        rng.normal(size=(B, cfg.image_size, cfg.image_size, 3)).astype(
            np.float32
        ),
        dtype=jnp.bfloat16,
    )
    lang = jnp.asarray(
        rng.normal(size=(B, 1, cfg.d_model)).astype(np.float32),
        dtype=jnp.bfloat16,
    )

    # init on an abstract pass, then cast to bf16 for MXU-native matmuls
    params = jax.jit(
        lambda k: model.init(
            k, frames, lang, method=Sam2Model.decode_frames_with_language
        )
    )(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def run(fr, le):
        out = model.apply(
            params, fr, le, method=Sam2Model.decode_frames_with_language
        )
        return out["low_res_masks"]

    # warmup/compile
    run(frames, lang).block_until_ready()

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(frames, lang)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = (iters * B) / dt

    print(
        json.dumps(
            {
                "metric": "sam2_hiera_l_1024_language_seg_throughput",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
