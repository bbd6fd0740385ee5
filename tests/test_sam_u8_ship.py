"""uint8 SAM-frame shipping: host PIL resize stays, normalization moves
on-device (ops.resize.sam_normalize_maybe) — bit-identical to the
host-normalized f32 path for SAM2 and SAM-v1 entry points, and the
train data layer emits uint8 sam_frames end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp

from rga3_tpu.data.datasets.base import (
    SAM_MEAN, SAM_STD, sam_preprocess_frame,
)


def test_sam_preprocess_u8_lossless():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    f32 = sam_preprocess_frame(frame, 64)
    u8 = sam_preprocess_frame(frame, 64, normalize=False)
    assert u8.dtype == np.uint8
    assert ((u8.astype(np.float32) - SAM_MEAN) / SAM_STD == f32).all()


def test_sam2_forward_image_u8_bit_identical():
    from rga3_tpu.models.sam2.config import tiny_sam2_config
    from rga3_tpu.models.sam2.model import Sam2Model

    cfg = tiny_sam2_config()
    model = Sam2Model(cfg)
    rng = np.random.default_rng(1)
    size = cfg.image_size
    u8 = rng.integers(0, 256, (1, size, size, 3)).astype(np.uint8)
    f32 = (u8.astype(np.float32) - SAM_MEAN) / SAM_STD
    lang = rng.normal(size=(1, 1, cfg.hidden_dim)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(f32), jnp.asarray(lang)
    )

    def fwd(x):
        out = model.apply(
            params, jnp.asarray(x),
            method=lambda m, im: m.forward_image(im),
        )
        return [np.asarray(f) for f in out["backbone_fpn"]]

    for a, b in zip(fwd(u8), fwd(f32)):
        assert (a == b).all()


def test_sam1_encode_image_u8_bit_identical():
    from rga3_tpu.models.sam1.config import tiny_sam1_config
    from rga3_tpu.models.sam1.model import Sam1Model

    cfg = tiny_sam1_config()
    model = Sam1Model(cfg)
    rng = np.random.default_rng(2)
    size = cfg.image_size
    u8 = rng.integers(0, 256, (1, size, size, 3)).astype(np.uint8)
    f32 = (u8.astype(np.float32) - SAM_MEAN) / SAM_STD
    lang = rng.normal(size=(1, 1, cfg.d_model)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(f32), jnp.asarray(lang)
    )

    def enc(x):
        return np.asarray(model.apply(
            params, jnp.asarray(x),
            method=lambda m, im: m.encode_image(im),
        ))

    assert (enc(u8) == enc(f32)).all()


def test_image_seg_sample_emits_u8_sam_frames():
    from rga3_tpu.data.datasets.base import build_pseudo_video_sample

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (30, 40, 3)).astype(np.uint8)
    mask = (rng.random((30, 40)) > 0.5).astype(np.uint8)
    s = build_pseudo_video_sample(
        "x", img, mask, "q?", "a.", num_frames_mllm=1, num_frames_sam=2,
        sam_size=32, mask_res=16,
    )
    assert s.sam_frames.dtype == np.uint8
    assert s.sam_frames.shape == (2, 32, 32, 3)
