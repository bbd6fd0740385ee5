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
