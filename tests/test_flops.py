"""Analytic FLOP counters vs XLA cost analysis on CPU.

On the CPU backend every Pallas kernel falls back to plain XLA, so
`compiled.cost_analysis()["flops"]` counts the real matmul work there —
the cross-check the TPU path can't do (tpu_custom_call reports 0 FLOPs).
Tolerances are loose: the cost model also counts elementwise ops and the
dense fallback computes full (not causal-half) attention rectangles.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.utils import flops as F


def xla_flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def test_primitives():
    assert F.dense(4, 5, 6) == 2 * 4 * 5 * 6
    assert F.attention(10, 20, 8) == 4 * 10 * 20 * 8
    assert F.conv2d(8, 8, 3, 3, 2, 4) == 2 * 64 * 9 * 2 * 4


def test_dense_matches_xla():
    a = jnp.zeros((32, 64))
    b = jnp.zeros((64, 128))
    got = xla_flops(lambda x, y: x @ y, a, b)
    assert got == F.dense(32, 64, 128)


def test_qwen_lm_flops_vs_xla():
    from rga3_tpu.models.qwen25vl import tiny_config
    from rga3_tpu.models.qwen25vl.model import Qwen25VL

    qcfg = tiny_config(vocab_size=512)
    model = Qwen25VL(qcfg)
    L = 32
    ids = jnp.zeros((1, L), jnp.int32)
    pos = jnp.zeros((3, 1, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, pos)

    def fwd(p, i, po):
        return model.apply(p, i, po)["logits"]

    got = xla_flops(fwd, params, ids, pos)
    pred = F.qwen_lm_flops(qcfg.text, L)
    assert 0.6 * got <= pred <= 1.45 * got, (pred, got)


@pytest.mark.slow
def test_sam2_decode_flops_vs_xla():
    from rga3_tpu.models.sam2 import tiny_sam2_config
    from rga3_tpu.models.sam2.model import Sam2Model

    cfg = tiny_sam2_config(image_size=64)
    model = Sam2Model(cfg)
    frames = jnp.zeros((1, 64, 64, 3))
    lang = jnp.zeros((1, 1, cfg.d_model))
    params = model.init(jax.random.PRNGKey(0), frames, lang)

    def fwd(p, f, le):
        out = model.apply(
            p, f, le, method=Sam2Model.decode_frames_with_language
        )
        return out["high_res_masks"]

    got = xla_flops(fwd, params, frames, lang)
    pred = F.sam2_decode_frame_flops(cfg)
    assert 0.5 * got <= pred <= 1.5 * got, (pred, got)


def test_full_size_magnitudes():
    """Hiera-L at 1024² is ~0.8 TFLOP/frame; Qwen-7B prefill ~2N per
    token — anchor the formulas to known magnitudes."""
    from rga3_tpu.models.sam2 import SAM2_HIERA_L
    from rga3_tpu.models.qwen25vl.config import QWEN25_VL_7B

    t = F.hiera_flops(SAM2_HIERA_L.hiera, 1024)
    # 48 blocks at ~24·T·D² each: stage 3 alone is ~1.2 TFLOP
    assert 1.4e12 < t < 2.4e12, t

    n_params = 7.6e9  # 7B text stack
    got = F.qwen_lm_flops(QWEN25_VL_7B.text, 512, lm_head=False)
    # ~2 * N * tokens (attention adds a few % at this length)
    assert 0.8 * 2 * n_params * 512 < got < 1.5 * 2 * n_params * 512, got


def test_train_step_flops_composition():
    from rga3_tpu.config import SegHeadConfig
    from rga3_tpu.models.qwen25vl import tiny_config
    from rga3_tpu.models.sam2 import tiny_sam2_config
    from rga3_tpu.models.unigr import UniGRConfig

    cfg = UniGRConfig(
        qwen=tiny_config(vocab_size=512),
        sam2=tiny_sam2_config(image_size=64),
        seg=SegHeadConfig(out_dim=32, seg_token_id=500),
    )
    frozen = F.unigr_train_step_flops(cfg, batch=2, seq=16, sam_frames=2)
    full = F.unigr_train_step_flops(
        cfg.replace(seg=cfg.seg.replace(freeze_sam_backbone=False)),
        batch=2, seq=16, sam_frames=2,
    )
    assert full > frozen  # trunk backward counted only when trainable
    lm_only = 2 * F.qwen_lm_flops(cfg.qwen.text, 2 * 16)
    assert frozen > lm_only
