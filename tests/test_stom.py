"""STOM overlay propagation on a synthetic moving-square video."""
import numpy as np
import pytest
from PIL import Image, ImageDraw

from rga3_tpu.models.stom import STOM


def _synthetic_video(t=5, size=128, step=6):
    """A textured square moving right by `step` px/frame."""
    rng = np.random.default_rng(0)
    tex = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    frames = []
    for i in range(t):
        bg = np.full((size, size, 3), 30, np.uint8)
        x = 20 + step * i
        bg[40:80, x : x + 40] = tex
        frames.append(Image.fromarray(bg))
    return frames


def _overlay_rect(size=128, box=(18, 38, 62, 82)):
    vip = Image.new("RGBA", (size, size), (0, 0, 0, 0))
    d = ImageDraw.Draw(vip)
    d.rectangle(box, outline=(255, 0, 0, 200), width=3)
    return vip


def test_propagate_rectangle_follows_motion():
    frames = _synthetic_video()
    vip = _overlay_rect()
    stom = STOM()
    out = stom.propagate_in_video(frames, vip, 0, shape="rectangle",
                                  grid_size=40)
    assert len(out) == len(frames)
    # overlay red pixels should shift right in later frames
    def red_centroid(img):
        a = np.asarray(img).astype(int)
        redness = (a[:, :, 0] - a[:, :, 1] - a[:, :, 2])
        ys, xs = np.nonzero(redness > 100)
        return xs.mean() if len(xs) else None

    c0 = red_centroid(out[0])
    c4 = red_centroid(out[4])
    assert c0 is not None and c4 is not None
    assert c4 > c0 + 10  # tracked ~24 px of motion


def test_propagate_mask_shape_draws_disc():
    frames = _synthetic_video()
    vip = Image.new("RGBA", (128, 128), (0, 0, 0, 0))
    d = ImageDraw.Draw(vip)
    d.rectangle([30, 50, 70, 70], fill=(0, 0, 255, 120))
    stom = STOM()
    out = stom.propagate_in_video(frames, vip, 0, shape="mask", grid_size=40)
    assert len(out) == len(frames)
    # later frames should contain some blue-ish overlay pixels
    a = np.asarray(out[2]).astype(int)
    blueness = a[:, :, 2] - a[:, :, 0]
    assert (blueness > 40).sum() > 0


def test_miscalibrated_visibility_head_falls_back_to_all_visible():
    """If the tracker's visibility head marks (most) query points hidden
    at the KEY frame — physically impossible, they are sampled from the
    visible prompt mask there — STOM must not silently no-op the
    overlay on every frame (measured failure mode: smooth photographic
    regions are out-of-family for the noise-trained confidence head).
    The fallback treats all points visible, LK-style."""

    class _AllHiddenTracker:
        def track(self, frames, mask, key_idx, grid_size=100):
            ys, xs = np.nonzero(mask)
            pts = np.stack([xs, ys], -1).astype(np.float32)[:8]
            t = len(frames)
            tracks = np.repeat(pts[None], t, axis=0)
            tracks += 6.0 * np.arange(t)[:, None, None] * np.array(
                [1.0, 0.0]
            )
            tracks -= 6.0 * key_idx * np.array([1.0, 0.0])
            return tracks, np.zeros((t, len(pts)), bool)

    frames = _synthetic_video()
    vip = _overlay_rect()
    stom = STOM(tracker=_AllHiddenTracker())
    out = stom.propagate_in_video(frames, vip, 0, shape="rectangle")
    # every frame must carry the red overlay, translated with the flow
    for i, (orig, comp) in enumerate(zip(frames, out)):
        diff = np.abs(
            np.asarray(comp, np.int32) - np.asarray(orig, np.int32)
        ).sum(-1)
        assert (diff > 40).sum() > 50, f"frame {i}: overlay missing"


@pytest.mark.slow
@pytest.mark.midlane
def test_shipped_tracker_quality_pinned():
    """The committed CoTracker3-small weights must keep beating LK where
    it matters: occlusion (LK chained flow never re-acquires hidden
    points — 11.5 px mean / 18.3 px hidden on this suite) while staying
    sub-pixel on smooth motion. Chip-measured reference: smooth 0.144 /
    large-motion 0.462 / occlusion 0.162 (hidden 0.616); thresholds are
    ~3x to absorb CPU-vs-TPU bf16 differences."""
    from rga3_tpu.models.stom.cotracker3 import shipped_tracker
    from rga3_tpu.models.stom.synth import benchmark_tracker

    tracker = shipped_tracker(max_points=16)
    assert tracker is not None, "shipped weights missing from the repo"
    report = benchmark_tracker(
        lambda f, p, i: tracker.track_points(list(f), p, i)[0],
        seeds=(0,),
    )
    # ~2x the r5 chip-measured values (0.137 / 0.471 / 0.16 / 0.616):
    # tight enough to catch a real quality regression, loose enough for
    # CPU-vs-TPU bf16 drift
    assert report["smooth"]["px_err"] < 0.3, report
    assert report["large_motion"]["px_err"] < 1.0, report
    assert report["occlusion"]["px_err"] < 0.35, report
    assert report["occlusion"]["px_err_occluded"] < 1.3, report


@pytest.mark.slow
@pytest.mark.midlane
def test_shipped_tracker_serving_resolution_pinned():
    """Serving-resolution (160x224) layered-parallax suite: the shipped
    small tracker must stay far ahead of both stay-put (11.1 px) and
    chained LK (23-46 px, WORSE than stay-put here). Thresholds ~2x the
    r5 chip-measured values (slow 0.839 / fast 0.479 / hidden 3.444)."""
    from rga3_tpu.models.stom.cotracker3 import shipped_tracker
    from rga3_tpu.models.stom.synth import benchmark_tracker_serving

    tracker = shipped_tracker(max_points=24)
    assert tracker is not None, "shipped weights missing from the repo"
    report = benchmark_tracker_serving(
        lambda f, p, i: tracker.track_points(list(f), p, i)[0],
        seeds=(0, 1, 2),
    )
    assert report["slow_px_err"] < 1.7, report
    assert report["fast_px_err"] < 1.0, report
    assert report["hidden_px_err"] < 7.0, report


@pytest.mark.slow
@pytest.mark.midlane
def test_shipped_tracker_generalizes_to_photo_textures():
    """Out-of-family check: the tracker trains on band-limited noise
    only, so run the serving-resolution suite with REAL photographic
    textures (matplotlib's bundled grace_hopper.jpg, random crops per
    layer). The shipped weights must keep beating chained LK — which
    collapses to ~stay-put here (slow 10.8 px vs stay-put 10.6) — i.e.
    the net learned correspondence, not a noise-texture shortcut.
    r5 measured (8 seeds), shipped mixed-texture fine-tune: slow 1.59 /
    fast 4.65 / hidden 10.75 (pre-fine-tune noise-only weights: 2.41 /
    7.20 / 13.50); thresholds ~2x measured."""
    from rga3_tpu.models.stom.cotracker3 import shipped_tracker
    from rga3_tpu.models.stom.synth import benchmark_tracker_serving

    tracker = shipped_tracker(max_points=24)
    assert tracker is not None, "shipped weights missing from the repo"
    report = benchmark_tracker_serving(
        lambda f, p, i: tracker.track_points(list(f), p, i)[0],
        texture="photo",
    )
    stay = report["stayput_px_err"]
    assert report["slow_px_err"] < 3.5, report
    assert report["fast_px_err"] < min(9.0, stay), report
    assert report["hidden_px_err"] < 16.0, report
