"""Host-side utilities: RLE codec, J&F metrics, samplers, rasterizer,
processor patchification."""
import numpy as np
import pytest

from rga3_tpu.utils import rle
from rga3_tpu.evaluation import jf_metrics
from rga3_tpu.data import templates
from rga3_tpu.data.processor import (
    expand_vision_tokens,
    preprocess_frames,
    render_chat,
    smart_resize,
    ChatMessage,
)


# ---------------------------------------------------------------- RLE
def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    m = (rng.random((37, 23)) > 0.6).astype(np.uint8)
    enc = rle.encode(m)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, m)
    assert rle.area(enc) == int(m.sum())


def test_rle_empty_and_full():
    z = np.zeros((5, 7), np.uint8)
    np.testing.assert_array_equal(rle.decode(rle.encode(z)), z)
    o = np.ones((5, 7), np.uint8)
    np.testing.assert_array_equal(rle.decode(rle.encode(o)), o)


def test_rle_uncompressed_counts():
    # column-major: 3 zeros then 3 ones fills column 0 of a (3, 2) mask? no:
    # h=3, w=2 -> flat length 6 column-major
    m = rle.decode({"size": [3, 2], "counts": [3, 3]})
    expect = np.zeros((3, 2), np.uint8)
    expect[:, 1] = 1
    np.testing.assert_array_equal(m, expect)


def test_rle_negative_counts_do_not_crash():
    """Malformed compressed strings can delta-decode to negative counts;
    the native codec must reject them (fall back to numpy) rather than
    memset with a negative (-> ~2^64) size."""
    m = rle.decode({"size": [4, 4], "counts": [3, -2, 5, 2]})
    assert m.shape == (4, 4)
    # numpy fallback semantics: negative run is an empty slice and walks
    # `pos` backwards; the decode stays in-bounds and returns a mask
    assert m.dtype == np.uint8


def test_rle_bbox():
    m = np.zeros((10, 10), np.uint8)
    m[2:5, 3:8] = 1
    bb = rle.to_bbox(rle.encode(m))
    np.testing.assert_array_equal(bb, [3, 2, 5, 3])


def test_rle_native_matches_numpy_fallback():
    """The C++ codec (native/rle.cpp) and the pure-numpy fallback must
    produce byte-identical strings and identical masks."""
    if rle._native_lib() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (13, 1), (1, 13), (64, 48), (127, 255)]:
        m = (rng.random(shape) > 0.5).astype(np.uint8)
        enc_native = rle.encode(m)
        # force the numpy fallback
        lib, rle._LIB, rle._LIB_FAILED = rle._LIB, None, True
        try:
            enc_py = rle.encode(m)
            dec_py = rle.decode(enc_native)
        finally:
            rle._LIB, rle._LIB_FAILED = lib, False
        assert enc_native["counts"] == enc_py["counts"], shape
        np.testing.assert_array_equal(rle.decode(enc_native), m)
        np.testing.assert_array_equal(dec_py, m)


# ---------------------------------------------------------------- J&F
def test_iou_identical_and_disjoint():
    a = np.zeros((16, 16), bool)
    a[4:10, 4:10] = True
    assert jf_metrics.db_eval_iou(a, a) == 1.0
    b = np.zeros_like(a)
    assert jf_metrics.db_eval_iou(a, b) == 0.0
    assert jf_metrics.db_eval_iou(b, b) == 1.0  # empty∩empty convention


def test_boundary_f_perfect_and_shifted():
    a = np.zeros((64, 64), bool)
    a[16:48, 16:48] = True
    assert jf_metrics.f_measure(a, a) == 1.0
    shifted = np.roll(a, 2, axis=0)
    f = jf_metrics.f_measure(shifted, a)
    assert 0.0 < f <= 1.0


def test_jf_score_batched():
    a = np.zeros((3, 32, 32), bool)
    a[:, 8:24, 8:24] = True
    out = jf_metrics.jf_score(a, a)
    assert out["J"] == 1.0 and out["F"] == 1.0 and out["J&F"] == 1.0


# ---------------------------------------------------------------- samplers
def test_sparse_indices_long_and_short():
    idx = templates.get_sparse_indices(100, 8)
    assert len(idx) == 8 and idx == sorted(idx) and max(idx) < 100
    idx = templates.get_sparse_indices(3, 8)
    assert len(idx) == 8 and set(idx) <= {0, 1, 2}


def test_dense_indices():
    idx = templates.get_dense_indices(8, 4)
    assert len(idx) == 4 and max(idx) <= 7


# ---------------------------------------------------------------- processor
def test_smart_resize_bounds():
    h, w = smart_resize(480, 640, 28, 4 * 28 * 28, 320 * 28 * 28)
    assert h % 28 == 0 and w % 28 == 0
    assert h * w <= 320 * 28 * 28
    h2, w2 = smart_resize(10, 10, 28, 4 * 28 * 28, 320 * 28 * 28)
    assert h2 * w2 >= 4 * 28 * 28


def test_preprocess_frames_shapes():
    frames = [np.zeros((56, 84, 3), np.uint8)] * 2
    patches, grid = preprocess_frames(frames, 4 * 28 * 28, 1280 * 28 * 28)
    t, h, w = grid
    assert t == 1  # 2 frames -> 1 temporal group
    assert patches.shape == (t * h * w, 3 * 2 * 14 * 14)
    # single image tiles to temporal_patch_size
    patches1, grid1 = preprocess_frames(
        [np.zeros((56, 56, 3), np.uint8)], 4 * 28 * 28, 1280 * 28 * 28
    )
    assert grid1[0] == 1


def test_chat_template_and_expansion():
    msgs = [
        ChatMessage("user", [
            {"type": "video"},
            {"type": "text", "text": "What happens?"},
        ])
    ]
    text = render_chat(msgs)
    assert text.startswith("<|im_start|>system")
    assert "<|vision_start|><|video_pad|><|vision_end|>" in text
    assert text.endswith("<|im_start|>assistant\n")
    expanded = expand_vision_tokens(text, video_grids=[(2, 4, 4)])
    assert expanded.count("<|video_pad|>") == 2 * 4 * 4 // 4


# ---------------------------------------------------------------- rasterizer
@pytest.mark.parametrize(
    "shape",
    ["rectangle", "ellipse", "arrow", "triangle", "point", "scribble",
     "mask", "mask contour"],
)
def test_image_blending_all_shapes(shape):
    from PIL import Image

    from rga3_tpu.data.visual_prompts import image_blending

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
    )
    mask = np.zeros((64, 80), np.uint8)
    mask[20:40, 30:60] = 1
    blended, vip = image_blending(
        img, shape=shape, mask=mask, rgb_value=(255, 0, 0),
        return_vip_img=True,
    )
    assert blended.size == img.size
    overlay = np.asarray(vip)
    assert overlay[..., 3].sum() > 0  # something was drawn


def test_video_blending_keyframes_only_marks_keys():
    from PIL import Image

    from rga3_tpu.data.visual_prompts import video_blending_keyframes

    img = Image.new("RGB", (64, 64), (10, 10, 10))
    mask = np.zeros((64, 64), np.uint8)
    mask[10:30, 10:30] = 1
    frames = [img, img, img]
    masks = [mask, mask, mask]
    keys = [False, True, False]
    out = video_blending_keyframes(frames, masks, keys, "red", "rectangle")
    assert np.array_equal(np.asarray(out[0]), np.asarray(img))
    assert not np.array_equal(np.asarray(out[1]), np.asarray(img))
    assert np.array_equal(np.asarray(out[2]), np.asarray(img))


def test_prefetch_loader_produces_and_propagates_errors():
    import itertools
    import threading
    import time as _time

    from rga3_tpu.data.prefetch import PrefetchLoader

    counter = itertools.count()
    lock = threading.Lock()

    def make_batch():
        with lock:
            i = next(counter)
        return {"i": i}

    loader = PrefetchLoader(make_batch, num_workers=2, buffer_size=2)
    got = [next(loader)["i"] for _ in range(10)]
    assert len(set(got)) == 10  # every batch distinct
    loader.close()

    # synchronous mode
    sync = PrefetchLoader(make_batch, num_workers=0)
    a, b = next(sync), next(sync)
    assert a["i"] != b["i"]

    # worker exceptions surface on the consumer side
    def boom():
        raise RuntimeError("producer failed")

    bad = PrefetchLoader(boom, num_workers=1, buffer_size=1)
    _time.sleep(0.2)
    import pytest

    with pytest.raises(RuntimeError, match="producer failed"):
        next(bad)
    bad.close()
