"""Synthetic point-tracking supervision for CoTrackerLite.

The official CoTracker3 checkpoint is not available offline (ref:
model/STOM.py:18 `scaled_offline.pth`), so the in-framework tracker is
trained on procedurally generated motion: a random smoothed texture
warped by a per-frame similarity transform (translation + rotation +
scale drift). Ground-truth tracks are the warped query positions — the
same supervision signal (dense correspondence under appearance constancy)
that real tracking data provides, minus occlusions.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _smooth_noise(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """(H, W, 3) float [0,1] band-limited texture (box-filtered noise)."""
    img = rng.random((h, w, 3)).astype(np.float32)
    k = 5
    pad = np.pad(img, ((k, k), (k, k), (0, 0)), mode="wrap")
    win = 2 * k + 1
    # integral image with a leading zero row/col so every window position
    # is represented (a bare double-cumsum drops one row/col)
    csum = np.zeros(
        (pad.shape[0] + 1, pad.shape[1] + 1, 3), np.float64
    )
    csum[1:, 1:] = np.cumsum(np.cumsum(pad, axis=0), axis=1)
    box = (
        csum[win:, win:] - csum[:-win, win:] - csum[win:, :-win]
        + csum[:-win, :-win]
    ) / (win * win)
    out = box[:h, :w].astype(np.float32)
    out = out - out.min()
    return out / max(out.max(), 1e-6)


def make_synthetic_batch(
    rng: np.random.Generator,
    t: int = 8,
    h: int = 64,
    w: int = 64,
    n_points: int = 16,
    max_speed: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (frames (T,H,W,3) [0,1], queries (N,3) = (t0,x,y),
    gt_tracks (T,N,2))."""
    margin = int(max_speed * t + 8)
    texture = _smooth_noise(rng, h + 2 * margin, w + 2 * margin)

    # per-frame similarity transform of the camera over the texture
    vel = rng.uniform(-max_speed, max_speed, size=2)
    rot_rate = rng.uniform(-0.01, 0.01)
    scale_rate = rng.uniform(-0.003, 0.003)
    cx, cy = w / 2, h / 2

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.zeros((t, h, w, 3), np.float32)
    mats = []
    for ti in range(t):
        ang = rot_rate * ti
        s = 1.0 + scale_rate * ti
        ca, sa = np.cos(ang) * s, np.sin(ang) * s
        tx, ty = vel * ti
        # frame pixel (x, y) samples texture at A @ (x-c) + c + t + margin
        a = np.array([[ca, -sa], [sa, ca]], np.float32)
        mats.append((a, np.array([tx, ty], np.float32)))
        gx = ca * (xs - cx) - sa * (ys - cy) + cx + tx + margin
        gy = sa * (xs - cx) + ca * (ys - cy) + cy + ty + margin
        x0 = np.clip(gx.astype(np.int32), 0, texture.shape[1] - 2)
        y0 = np.clip(gy.astype(np.int32), 0, texture.shape[0] - 2)
        fx = (gx - x0)[..., None]
        fy = (gy - y0)[..., None]
        f = (
            texture[y0, x0] * (1 - fx) * (1 - fy)
            + texture[y0, x0 + 1] * fx * (1 - fy)
            + texture[y0 + 1, x0] * (1 - fx) * fy
            + texture[y0 + 1, x0 + 1] * fx * fy
        )
        frames[ti] = f

    # queries on frame 0, away from the border
    qx = rng.uniform(8, w - 8, n_points).astype(np.float32)
    qy = rng.uniform(8, h - 8, n_points).astype(np.float32)
    queries = np.stack(
        [np.zeros(n_points, np.float32), qx, qy], axis=1
    )

    # gt: the texture point under (x, y) at frame 0 appears at frame ti
    # where A_ti @ (p - c) + c + t_ti == A_0 @ (q - c) + c + t_0
    a0, t0 = mats[0]
    tex_pt = (a0 @ np.stack([qx - cx, qy - cy])).T + t0  # (N, 2)
    gt = np.zeros((t, n_points, 2), np.float32)
    for ti in range(t):
        a, tv = mats[ti]
        rel = tex_pt - tv
        inv = np.linalg.inv(a)
        p = (inv @ rel.T).T
        gt[ti, :, 0] = p[:, 0] + cx
        gt[ti, :, 1] = p[:, 1] + cy
    return frames, queries, gt


# ---------------------------------------------------------------------------
# Fixed benchmark suite (occlusion + large motion), VERDICT r2 item 6:
# a deterministic px-error harness any tracker backend can be scored on.
# ---------------------------------------------------------------------------

def _add_occluder(
    rng: np.random.Generator, frames: np.ndarray, gt: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Composite an opaque textured sprite sweeping across the tracked
    points mid-clip. Returns (frames, vis (T, N) bool) — vis False where
    the GT point sits under the sprite (the tracker cannot see it)."""
    t, h, w, _ = frames.shape
    n = gt.shape[1]
    side = max(8, min(h, w) // 3)
    tex = _smooth_noise(rng, side, side) * 0.5  # dark so it's distinct
    # aim at the tracked point nearest the cloud centre mid-clip (the
    # bare mean can miss every point for spread-out clouds, leaving the
    # "occlusion" case occlusion-free)
    mid = gt[t // 2]
    target = mid[np.argmin(
        np.linalg.norm(mid - mid.mean(axis=0), axis=-1)
    )]
    step = side  # sweep one sprite-width per frame
    vis = np.ones((t, n), bool)
    frames = frames.copy()
    for ti in range(t):
        cx = target[0] + (ti - t // 2) * step
        cy = target[1]
        x0, y0 = int(round(cx - side / 2)), int(round(cy - side / 2))
        xa, ya = max(x0, 0), max(y0, 0)
        xb, yb = min(x0 + side, w), min(y0 + side, h)
        if xb > xa and yb > ya:
            frames[ti, ya:yb, xa:xb] = tex[
                ya - y0 : yb - y0, xa - x0 : xb - x0
            ]
        under = (
            (gt[ti, :, 0] >= x0) & (gt[ti, :, 0] < x0 + side)
            & (gt[ti, :, 1] >= y0) & (gt[ti, :, 1] < y0 + side)
        )
        vis[ti] = ~under
    return frames, vis


BENCH_CASES = ("smooth", "large_motion", "occlusion")


def make_synthetic_case(
    rng: np.random.Generator,
    case: str,
    t: int = 8,
    h: int = 64,
    w: int = 64,
    n_points: int = 16,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One benchmark clip: (frames (T,H,W,3) [0,1], queries (N,3),
    gt_tracks (T,N,2), gt_vis (T,N) bool).

    smooth        gentle similarity motion (<=2 px/frame) — the training
                  distribution of scripts/train_cotracker.py
    large_motion  <=8 px/frame translation + stronger rotation/scale
    occlusion     smooth motion + an opaque sprite sweeping over the
                  tracked points (vis goes False under it)
    """
    assert case in BENCH_CASES, case
    speed = 8.0 if case == "large_motion" else 2.0
    frames, queries, gt = make_synthetic_batch(
        rng, t=t, h=h, w=w, n_points=n_points, max_speed=speed
    )
    vis = np.ones((t, n_points), bool)
    if case == "occlusion":
        frames, vis = _add_occluder(rng, frames, gt)
    return frames, queries, gt, vis


def benchmark_tracker(
    track_points_fn,
    cases: Tuple[str, ...] = BENCH_CASES,
    seeds: Tuple[int, ...] = (0, 1, 2),
    t: int = 8,
    size: int = 64,
    n_points: int = 16,
) -> dict:
    """Score `track_points_fn(frames_u8 (T,H,W,3) uint8, pts0 (N,2),
    query_frame_idx) -> (T,N,2)` on the fixed suite.

    Per case: mean px error over GT-visible points, the stay-put
    baseline on the same points, and (occlusion only) the error measured
    while points are hidden — re-detection quality after the sprite
    passes shows up in px_err, behavior under it in px_err_occluded."""
    out = {}
    for case in cases:
        errs, occ_errs, stay = [], [], []
        for s in seeds:
            rng = np.random.default_rng(1000 + s)
            frames, queries, gt, vis = make_synthetic_case(
                rng, case, t=t, h=size, w=size, n_points=n_points
            )
            pts0 = queries[:, 1:3]
            frames_u8 = (frames * 255.0).astype(np.uint8)
            pred = np.asarray(track_points_fn(frames_u8, pts0, 0))
            err = np.linalg.norm(pred - gt, axis=-1)
            errs.append(float(err[vis].mean()))
            if (~vis).any():
                occ_errs.append(float(err[~vis].mean()))
            stay_err = np.linalg.norm(pts0[None] - gt, axis=-1)
            stay.append(float(stay_err[vis].mean()))
        out[case] = {
            "px_err": round(float(np.mean(errs)), 3),
            "stayput_px_err": round(float(np.mean(stay)), 3),
        }
        if occ_errs:
            out[case]["px_err_occluded"] = round(
                float(np.mean(occ_errs)), 3
            )
    return out
