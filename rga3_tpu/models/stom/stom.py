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

Host-path design: the reference composites with PIL over full frames
per frame (STOM.py:145-160); here the warp is an integer slice shift of
the overlay's bounding-box patch and the alpha-composite runs as numpy
integer math ONLY inside that window — byte-identical to
PIL.Image.alpha_composite over an opaque destination (exact /255
rounding via ((t+128) + ((t+128)>>8)) >> 8), ~10x less host time per
sample at 480x854 (pinned by tests/test_stom.py byte-equality).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .tracker import LKTracker


def _composite_window(
    dst_rgb: np.ndarray,  # (H, W, 3) uint8 — modified in place
    src_rgba: np.ndarray,  # (h, w, 4) uint8 patch
    y0: int,
    x0: int,
) -> None:
    """Alpha-composite an RGBA patch over an opaque RGB frame, in place,
    byte-identical to PIL.Image.alpha_composite (dst alpha 255): for each
    channel t = src*a + dst*(255-a), out = round(t/255) computed exactly
    in integers. Window is clipped to the frame."""
    H, W = dst_rgb.shape[:2]
    h, w = src_rgba.shape[:2]
    sy0, sx0 = max(0, -y0), max(0, -x0)
    dy0, dx0 = max(0, y0), max(0, x0)
    dy1, dx1 = min(H, y0 + h), min(W, x0 + w)
    if dy1 <= dy0 or dx1 <= dx0:
        return
    patch = src_rgba[sy0 : sy0 + (dy1 - dy0), sx0 : sx0 + (dx1 - dx0)]
    a = patch[..., 3:4].astype(np.uint32)
    win = dst_rgb[dy0:dy1, dx0:dx1]
    t = patch[..., :3].astype(np.uint32) * a + win.astype(np.uint32) * (
        255 - a
    )
    win[:] = ((((t + 128) >> 8) + t + 128) >> 8).astype(np.uint8)


def _rgba_bbox(rgba: np.ndarray) -> Optional[Tuple[int, int, int, int]]:
    """(y0, y1, x0, x1) bounds of alpha>0, or None when fully clear."""
    alpha = rgba[:, :, 3] > 0
    rows = np.flatnonzero(alpha.any(axis=1))
    if rows.size == 0:
        return None
    cols = np.flatnonzero(alpha.any(axis=0))
    return int(rows[0]), int(rows[-1]) + 1, int(cols[0]), int(cols[-1]) + 1


def default_tracker():
    """Resolve the default STOM tracker backend.

    `RGA3_STOM_TRACKER` env: `cotracker3` forces the shipped trained
    CoTracker3 weights (error if absent), `lk` forces pyramidal LK,
    a path ending in `.npz` loads that self-describing CoTracker3
    weight file (e.g. the official-dims synthetic-curriculum weights,
    scripts/train_cotracker.py --preset official), and `auto`/unset
    prefers the shipped CoTracker3 when its weight file exists (it
    survives occlusion — the capability the reference gets from
    CoTracker3 backward tracking, ref model/STOM.py:59-65; LK's
    chained flow never re-acquires hidden points) and falls back to LK.
    """
    import os

    choice = os.environ.get("RGA3_STOM_TRACKER", "auto")
    if choice.lower() == "lk":
        return LKTracker()
    from .cotracker3 import shipped_tracker

    if choice.endswith(".npz"):
        tracker = shipped_tracker(path=choice)
        if tracker is None:
            raise FileNotFoundError(
                f"RGA3_STOM_TRACKER={choice}: no such weight file"
            )
        return tracker
    tracker = shipped_tracker()
    if tracker is None:
        if choice.lower() == "cotracker3":
            raise FileNotFoundError(
                "RGA3_STOM_TRACKER=cotracker3 but no shipped weights "
                "(rga3_tpu/models/stom/weights/cotracker3_small.npz)"
            )
        return LKTracker()
    return tracker


class STOM:
    def __init__(self, tracker=None):
        self.tracker = tracker or default_tracker()

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

    @staticmethod
    def _frames_to_rgb(frames: Sequence) -> List[np.ndarray]:
        """PIL or (H, W, 3) uint8 ndarray frames -> list of RGB arrays.
        ndarray input is passed through without a copy — the eval drivers
        decode video straight to numpy, so PIL wrapping is never needed
        on the hot path."""
        out = []
        for f in frames:
            if isinstance(f, np.ndarray):
                out.append(np.ascontiguousarray(f[..., :3]))
            else:
                out.append(
                    np.asarray(f if f.mode == "RGB" else f.convert("RGB"))
                )
        return out

    def track_in_video(
        self,
        frames: Sequence[Image.Image],
        vip_frame: Image.Image,
        vip_frame_idx: int,
        grid_size: int = 100,
        _frames_rgb: Optional[List[np.ndarray]] = None,
    ):
        arr = _frames_rgb or self._frames_to_rgb(frames)
        mask = self._query_mask(vip_frame)
        tracks, vis = self.tracker.track(
            arr, mask, vip_frame_idx, grid_size=grid_size
        )
        # Visibility-head sanity: query points are sampled FROM the
        # visible prompt mask at the key frame, so they are visible
        # there by construction. If the head marks most of them hidden
        # at the key frame, its confidence is miscalibrated for this
        # content (measured failure: smooth photographic regions are
        # out-of-family for the noise-trained tracker) — compositing
        # would silently no-op on every frame. Fall back to all-visible
        # (LK semantics); the compositor's 3*MAD flow filter still
        # rejects individual bad tracks.
        if vis.shape[0] and vis[vip_frame_idx].mean() < 0.5:
            vis = np.ones_like(vis)
        return tracks, vis

    # -- overlay warps --------------------------------------------------
    @staticmethod
    def _warp_translate(
        src_patch: np.ndarray,  # (h, w, 4) overlay bbox crop
        patch_y0: int,
        patch_x0: int,
        tgt_frame: np.ndarray,  # (H, W, 3) uint8
        dy: float,
        dx: float,
    ) -> np.ndarray:
        out = tgt_frame.copy()
        _composite_window(
            out,
            src_patch,
            patch_y0 + int(round(dy)),
            patch_x0 + int(round(dx)),
        )
        return out

    @staticmethod
    def _warp_point(
        src_vip: np.ndarray,
        tgt_frame: np.ndarray,
        tracks: np.ndarray,  # (N, 2) xy
        vis: np.ndarray,  # (N,) bool
    ) -> np.ndarray:
        import cv2

        if vis.sum() < len(tracks) // 2:
            return tgt_frame
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
        out = tgt_frame.copy()
        if m["m00"] != 0:
            cx = int(m["m10"] / m["m00"])
            cy = int(m["m01"] / m["m00"])
            radius = min(h, w) // 20
            # disc patch in the overlay color, composited in-window
            side = 2 * radius + 1
            y0, x0 = cy - radius, cx - radius
            circle = np.zeros((side, side), np.uint8)
            cv2.circle(circle, (radius, radius), radius, 255, -1)
            patch = np.zeros((side, side, 4), np.uint8)
            patch[circle > 0] = color
            _composite_window(out, patch, y0, x0)
        return out

    # -- main entry (ref :72-141) ---------------------------------------
    def propagate_in_video(
        self,
        frames: Sequence,  # PIL Images or (H, W, 3) uint8 ndarrays
        src_frame_vip,  # PIL RGBA Image or (H, W, 4) uint8 ndarray
        vip_frame_idx: int,
        shape: str = "rectangle",
        grid_size: int = 100,
    ) -> List:
        """Returns frames in the same form they came in: ndarray frames ->
        ndarray outputs (zero PIL round-trips on the eval hot path), PIL
        frames -> PIL outputs."""
        want_pil = not isinstance(frames[0], np.ndarray)
        frames_rgb = self._frames_to_rgb(frames)
        tracks, vis = self.track_in_video(
            frames, src_frame_vip, vip_frame_idx, grid_size,
            _frames_rgb=frames_rgb,
        )
        out = self._compose_from_tracks(
            frames_rgb, tracks, vis, np.asarray(src_frame_vip),
            vip_frame_idx, shape,
        )
        if want_pil:
            return [Image.fromarray(a, "RGB") for a in out]
        return out

    def propagate_in_video_batch(
        self,
        batch: Sequence[dict],
        grid_size: int = 100,
    ) -> List[List[np.ndarray]]:
        """Propagate B samples' overlays with ONE tracker dispatch when
        the backend supports it (CoTracker3Predictor.track_batch) — the
        per-call relay latency dominates the tracker leg, so an eval
        batch's clips should ride one device call.

        batch: [{"frames": [np RGB or PIL], "vip": RGBA np/PIL,
                 "key_idx": int, "shape": str}].
        Returns per-sample frame lists (same form as the input frames).
        """
        arrs = [self._frames_to_rgb(s["frames"]) for s in batch]
        vips = [np.asarray(s["vip"]) for s in batch]
        idxs = [s.get("key_idx", 0) for s in batch]
        masks = [
            self._query_mask(v) if (v[:, :, 3] > 0).any()
            else np.zeros(v.shape[:2], np.uint8)
            for v in vips
        ]
        if hasattr(self.tracker, "track_batch") and len(
            {len(a) for a in arrs}
        ) == 1:
            tr = self.tracker.track_batch(
                arrs, masks, idxs, grid_size=grid_size
            )
        else:
            tr = [
                self.tracker.track(a, m, i, grid_size=grid_size)
                for a, m, i in zip(arrs, masks, idxs)
            ]
        outs = []
        for s, a, v, i, (tracks, vis) in zip(batch, arrs, vips, idxs, tr):
            out = self._compose_from_tracks(
                a, tracks, vis, v, i, s.get("shape", "rectangle")
            )
            if not isinstance(s["frames"][0], np.ndarray):
                out = [Image.fromarray(x, "RGB") for x in out]
            outs.append(out)
        return outs

    def _compose_from_tracks(
        self,
        frames_rgb: List[np.ndarray],
        tracks: np.ndarray,
        vis: np.ndarray,
        src_vip: np.ndarray,
        vip_frame_idx: int,
        shape: str,
    ) -> List[np.ndarray]:
        vip_track = tracks[vip_frame_idx]
        bbox = _rgba_bbox(src_vip)
        if bbox is None:
            patch, py0, px0 = src_vip[:0, :0], 0, 0
        else:
            py0, py1, px0, px1 = bbox
            patch = src_vip[py0:py1, px0:px1]

        out: List[np.ndarray] = []
        for idx, tgt_rgb in enumerate(frames_rgb):
            if idx == vip_frame_idx:
                composed = tgt_rgb.copy()
                _composite_window(composed, patch, py0, px0)
                out.append(composed)
                continue

            t_track = tracks[idx]
            t_vis = vis[idx]
            if shape in ("mask", "mask contour"):
                try:
                    out.append(
                        self._warp_point(src_vip, tgt_rgb, t_track, t_vis)
                    )
                except Exception:
                    out.append(tgt_rgb)
                continue

            vip_visible = vip_track[t_vis]
            tgt_visible = t_track[t_vis]
            flows = tgt_visible - vip_visible
            if len(flows) == 0:
                out.append(tgt_rgb)
                continue
            mags = np.linalg.norm(flows, axis=1)
            median = np.median(mags)
            mad = np.median(np.abs(mags - median))
            keep = (mags >= median - 3 * mad) & (mags <= median + 3 * mad)
            filtered = flows[keep]
            if len(filtered) < t_vis.shape[0] // 2:
                out.append(tgt_rgb)
                continue
            # note: tracks are (x, y); the translate warp takes (dy, dx)
            avg_dx = float(np.mean(filtered[:, 0]))
            avg_dy = float(np.mean(filtered[:, 1]))
            if np.isnan(avg_dx) or np.isnan(avg_dy):
                out.append(tgt_rgb)
                continue
            out.append(
                self._warp_translate(
                    patch, py0, px0, tgt_rgb, avg_dy, avg_dx
                )
            )
        return out
