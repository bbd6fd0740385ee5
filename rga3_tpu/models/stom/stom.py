"""STOM — Spatio-Temporal Overlay Module.

Propagates a single-frame RGBA visual-prompt overlay to every frame of a
video by tracking points seeded in the overlay region
(ref: model/STOM.py:24-207). Behavior matched to the reference:

  * query mask = filled circle at the overlay bbox centroid, radius
    0.3 * min(bbox side) (:38-54);
  * shape overlays: per-frame flows vip->tgt over visible points, MAD
    outlier rejection at 3*MAD around the median magnitude, reject the
    frame when < 50% of points survive, translate the RGBA overlay by the
    mean flow and alpha-composite (:104-141, warp :145-160);
  * mask-type overlays: rebuild a morphologically-closed point mask and
    draw a centroid disc in the overlay's color (:163-207).

The tracker backend is pluggable (tracker.py).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from .tracker import LKTracker


class STOM:
    def __init__(self, tracker=None):
        self.tracker = tracker or LKTracker()

    # -- query mask (ref :38-54) ---------------------------------------
    @staticmethod
    def _query_mask(vip_frame: Image.Image) -> np.ndarray:
        import cv2

        vip_mask = (np.asarray(vip_frame)[:, :, 3] > 0).astype(np.uint8)
        coords = np.argwhere(vip_mask)
        min_y, min_x = coords.min(axis=0)
        max_y, max_x = coords.max(axis=0)
        cx = (min_x + max_x) // 2
        cy = (min_y + max_y) // 2
        radius = int(min(max_x - min_x, max_y - min_y) * 0.3)
        out = np.zeros_like(vip_mask)
        cv2.circle(out, (int(cx), int(cy)), max(radius, 1), 1, cv2.FILLED)
        return out

    def track_in_video(
        self,
        frames: Sequence[Image.Image],
        vip_frame: Image.Image,
        vip_frame_idx: int,
        grid_size: int = 100,
    ):
        arr = [np.asarray(f.convert("RGB")) for f in frames]
        mask = self._query_mask(vip_frame)
        tracks, vis = self.tracker.track(
            arr, mask, vip_frame_idx, grid_size=grid_size
        )
        return tracks, vis

    # -- overlay warps --------------------------------------------------
    @staticmethod
    def _warp_translate(
        src_vip: np.ndarray, tgt_frame: np.ndarray, dy: float, dx: float
    ):
        h, w = tgt_frame.shape[:2]
        warped = np.zeros_like(src_vip)
        ys, xs = np.nonzero(src_vip[:, :, 3] > 0)
        ny = (ys + int(round(dy))).clip(-1, h)
        nx = (xs + int(round(dx))).clip(-1, w)
        ok = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        warped[ny[ok], nx[ok]] = src_vip[ys[ok], xs[ok]]
        vip = Image.fromarray(warped, "RGBA")
        out = Image.alpha_composite(
            Image.fromarray(tgt_frame, "RGB").convert("RGBA"), vip
        )
        return out.convert("RGB"), vip

    @staticmethod
    def _warp_point(
        src_vip: np.ndarray,
        tgt_frame: np.ndarray,
        tracks: np.ndarray,  # (N, 2) xy
        vis: np.ndarray,  # (N,) bool
    ):
        import cv2

        if vis.sum() < len(tracks) // 2:
            return Image.fromarray(tgt_frame, "RGB"), None
        vip_mask = src_vip[:, :, 3] > 0
        if vip_mask.any():
            color = src_vip[vip_mask][0].copy()
        else:
            color = np.zeros(4, np.uint8)
        color[3] = max(min(int(color[3]), 148), 96)

        h, w = src_vip.shape[:2]
        mask = np.zeros((h, w), np.uint8)
        pts = tracks[vis]
        xi = pts[:, 0].astype(int).clip(0, w - 1)
        yi = pts[:, 1].astype(int).clip(0, h - 1)
        mask[yi, xi] = 255
        k = max(min(h, w) // 15, 3)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        closed = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
        m = cv2.moments(closed)
        warped = np.zeros_like(src_vip)
        if m["m00"] != 0:
            cx = int(m["m10"] / m["m00"])
            cy = int(m["m01"] / m["m00"])
            radius = min(h, w) // 20
            circle = np.zeros((h, w), np.uint8)
            cv2.circle(circle, (cx, cy), radius, 255, -1)
            warped[circle > 0] = color
        vip = Image.fromarray(warped, "RGBA")
        out = Image.alpha_composite(
            Image.fromarray(tgt_frame, "RGB").convert("RGBA"), vip
        )
        return out.convert("RGB"), vip

    # -- main entry (ref :72-141) ---------------------------------------
    def propagate_in_video(
        self,
        frames: Sequence[Image.Image],
        src_frame_vip: Image.Image,
        vip_frame_idx: int,
        shape: str = "rectangle",
        grid_size: int = 100,
    ) -> List[Image.Image]:
        tracks, vis = self.track_in_video(
            frames, src_frame_vip, vip_frame_idx, grid_size
        )
        vip_track = tracks[vip_frame_idx]
        src_vip = np.asarray(src_frame_vip)

        out: List[Image.Image] = []
        for idx, tgt in enumerate(frames):
            tgt_rgb = np.asarray(tgt.convert("RGB"))
            if idx == vip_frame_idx:
                composed = Image.alpha_composite(
                    tgt.convert("RGBA"), src_frame_vip
                ).convert("RGB")
                out.append(composed)
                continue

            t_track = tracks[idx]
            t_vis = vis[idx]
            if shape in ("mask", "mask contour"):
                try:
                    frame_out, _ = self._warp_point(
                        src_vip, tgt_rgb, t_track, t_vis
                    )
                    out.append(frame_out)
                except Exception:
                    out.append(tgt)
                continue

            vip_visible = vip_track[t_vis]
            tgt_visible = t_track[t_vis]
            flows = tgt_visible - vip_visible
            if len(flows) == 0:
                out.append(tgt)
                continue
            mags = np.linalg.norm(flows, axis=1)
            median = np.median(mags)
            mad = np.median(np.abs(mags - median))
            keep = (mags >= median - 3 * mad) & (mags <= median + 3 * mad)
            filtered = flows[keep]
            if len(filtered) < t_vis.shape[0] // 2:
                out.append(tgt)
                continue
            # note: tracks are (x, y); the translate warp takes (dy, dx)
            avg_dx = float(np.mean(filtered[:, 0]))
            avg_dy = float(np.mean(filtered[:, 1]))
            if np.isnan(avg_dx) or np.isnan(avg_dy):
                out.append(tgt)
                continue
            frame_out, _ = self._warp_translate(
                src_vip, tgt_rgb, avg_dy, avg_dx
            )
            out.append(frame_out)
        return out
