"""Byte-equality of STOM's windowed numpy compositing vs PIL.

The round-2 host driver warped with full-frame nonzero scatter + PIL
alpha_composite (matching ref model/STOM.py:145-160); the current driver
does an integer slice shift + in-window integer compositing. These tests
pin the new path byte-for-byte against a direct PIL implementation of
the old one, including out-of-frame shifts and the key-frame composite.
"""
import numpy as np
import pytest
from PIL import Image

from rga3_tpu.models.stom.stom import STOM, _composite_window, _rgba_bbox


def _pil_translate_composite(src_vip, tgt_rgb, dy, dx):
    """The previous implementation: full-frame scatter + PIL composite."""
    h, w = tgt_rgb.shape[:2]
    warped = np.zeros_like(src_vip)
    ys, xs = np.nonzero(src_vip[:, :, 3] > 0)
    ny = (ys + int(round(dy))).clip(-1, h)
    nx = (xs + int(round(dx))).clip(-1, w)
    ok = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
    warped[ny[ok], nx[ok]] = src_vip[ys[ok], xs[ok]]
    out = Image.alpha_composite(
        Image.fromarray(tgt_rgb, "RGB").convert("RGBA"),
        Image.fromarray(warped, "RGBA"),
    )
    return np.asarray(out.convert("RGB"))


@pytest.mark.parametrize(
    "dy,dx",
    [(0.0, 0.0), (12.4, -7.6), (-30.0, 55.0), (200.0, 200.0),
     (-500.0, 0.0), (0.49, -0.49)],
)
def test_translate_warp_matches_pil(dy, dx):
    rng = np.random.default_rng(3)
    H, W = 96, 160
    tgt = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    vip = np.zeros((H, W, 4), np.uint8)
    import cv2

    cv2.ellipse(vip, (90, 40), (35, 22), 15, 0, 360, (255, 0, 0, 180), 5)
    # some semi-transparent interior pixels too
    vip[35:45, 80:100] = (40, 200, 90, 120)

    y0, y1, x0, x1 = _rgba_bbox(vip)
    got = np.asarray(
        STOM._warp_translate(vip[y0:y1, x0:x1], y0, x0, tgt, dy, dx)
    )
    want = _pil_translate_composite(vip, tgt, dy, dx)
    assert np.array_equal(got, want)


def test_keyframe_composite_matches_pil():
    rng = np.random.default_rng(4)
    H, W = 64, 80
    tgt = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    vip = np.zeros((H, W, 4), np.uint8)
    vip[10:30, 20:60] = (255, 255, 0, 77)
    want = np.asarray(
        Image.alpha_composite(
            Image.fromarray(tgt, "RGB").convert("RGBA"),
            Image.fromarray(vip, "RGBA"),
        ).convert("RGB")
    )
    got = tgt.copy()
    y0, y1, x0, x1 = _rgba_bbox(vip)
    _composite_window(got, vip[y0:y1, x0:x1], y0, x0)
    assert np.array_equal(got, want)


def test_warp_point_disc_matches_fullcanvas():
    """Disc drawn on a small patch + window-clipped == disc drawn on the
    full canvas then PIL-composited (incl. a near-border centroid)."""
    import cv2

    rng = np.random.default_rng(5)
    H, W = 72, 90
    tgt = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    src_vip = np.zeros((H, W, 4), np.uint8)
    src_vip[2:8, 2:8] = (0, 0, 255, 200)

    # points clustered near the top-left corner -> centroid near border
    n = 40
    pts = rng.uniform([0, 0], [12, 12], (n, 2)).astype(np.float32)
    vis = np.ones(n, bool)

    got = np.asarray(STOM._warp_point(src_vip, tgt, pts, vis))

    # full-canvas reference (previous implementation)
    color = src_vip[src_vip[:, :, 3] > 0][0].copy()
    color[3] = max(min(int(color[3]), 148), 96)
    mask = np.zeros((H, W), np.uint8)
    xi = pts[:, 0].astype(int).clip(0, W - 1)
    yi = pts[:, 1].astype(int).clip(0, H - 1)
    mask[yi, xi] = 255
    k = max(min(H, W) // 15, 3)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    closed = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
    m = cv2.moments(closed)
    assert m["m00"] != 0
    cx, cy = int(m["m10"] / m["m00"]), int(m["m01"] / m["m00"])
    radius = min(H, W) // 20
    circle = np.zeros((H, W), np.uint8)
    cv2.circle(circle, (cx, cy), radius, 255, -1)
    warped = np.zeros_like(src_vip)
    warped[circle > 0] = color
    want = np.asarray(
        Image.alpha_composite(
            Image.fromarray(tgt, "RGB").convert("RGBA"),
            Image.fromarray(warped, "RGBA"),
        ).convert("RGB")
    )
    assert np.array_equal(got, want)


def test_numpy_io_matches_pil_io():
    """propagate_in_video with ndarray frames returns the same pixels as
    with PIL frames (and the same types as the input)."""
    from tests.test_stom import _overlay_rect, _synthetic_video

    pil_frames = _synthetic_video()
    vip = _overlay_rect()
    np_frames = [np.asarray(f) for f in pil_frames]
    vip_np = np.asarray(vip)

    out_pil = STOM().propagate_in_video(
        pil_frames, vip, 0, shape="rectangle", grid_size=40
    )
    out_np = STOM().propagate_in_video(
        np_frames, vip_np, 0, shape="rectangle", grid_size=40
    )
    assert all(isinstance(f, Image.Image) for f in out_pil)
    assert all(isinstance(f, np.ndarray) for f in out_np)
    for a, b in zip(out_pil, out_np):
        assert np.array_equal(np.asarray(a), b)


def test_propagate_batch_matches_sequential():
    """propagate_in_video_batch == per-sample propagate_in_video (LK
    backend exercises the no-track_batch fallback)."""
    from tests.test_stom import _overlay_rect, _synthetic_video

    frames = [np.asarray(f) for f in _synthetic_video()]
    vip = np.asarray(_overlay_rect())
    vip2 = np.zeros_like(vip)
    vip2[50:70, 30:70] = (0, 0, 255, 120)

    s = STOM()
    batch = [
        {"frames": frames, "vip": vip, "key_idx": 0,
         "shape": "rectangle"},
        {"frames": frames, "vip": vip2, "key_idx": 0, "shape": "mask"},
        # empty overlay: frames pass through unchanged
        {"frames": frames, "vip": np.zeros_like(vip), "key_idx": 0,
         "shape": "rectangle"},
    ]
    outs = s.propagate_in_video_batch(batch, grid_size=40)
    for spec, got in zip(batch[:2], outs[:2]):
        want = STOM().propagate_in_video(
            spec["frames"], spec["vip"], spec["key_idx"],
            shape=spec["shape"], grid_size=40,
        )
        for a, b in zip(got, want):
            assert np.array_equal(a, b)
    for a, b in zip(outs[2], frames):
        assert np.array_equal(a, b)
