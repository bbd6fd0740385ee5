"""CoTracker-style point-tracking transformer in JAX (flax.linen).

The reference's STOM depends on the external CoTracker3 torch package +
`scaled_offline.pth` checkpoint (ref: model/STOM.py:10-21). This module is
the in-framework TPU-native counterpart: the same algorithmic skeleton —
a convolutional feature encoder, multi-scale local correlation around the
current track estimates, and an iterative transformer that alternates
attention over time and over tracks — implemented with static shapes so
the whole M-iteration refinement jits as one graph.

It is a trainable tracker with the CoTracker predictor interface
(track(frames, queries) -> tracks, visibility); converting the official
torch checkpoint requires the upstream package layout and is left to a
dedicated loader once that package is available offline. STOM defaults to
the LK backend; switch with STOM(tracker=CoTrackerJax(params, model)).

Design notes (TPU-first):
  * correlation sampling is a gather-free bilinear interpolation over a
    fixed 7x7 offset grid at 4 pyramid scales -> (49 * 4) features;
  * time/track attention runs as two dense attentions over the
    (tracks, time, dim) token cube per iteration (lax-friendly, no ragged
    shapes);
  * M refinement iterations run as a lax.scan.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(fmap: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """fmap (H, W, C); xy (..., 2) in pixel coords of that map."""
    h, w, c = fmap.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    f00 = fmap[y0, x0]
    f01 = fmap[y0, x1]
    f10 = fmap[y1, x0]
    f11 = fmap[y1, x1]
    return (
        f00 * (1 - wx) * (1 - wy)
        + f01 * wx * (1 - wy)
        + f10 * (1 - wx) * wy
        + f11 * wx * wy
    )


class ConvBlock(nn.Module):
    dim: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", name="conv1")(x)
        y = nn.GroupNorm(num_groups=8, name="norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.dim, (3, 3), padding="SAME", name="conv2")(y)
        y = nn.GroupNorm(num_groups=8, name="norm2")(y)
        if self.stride != 1 or x.shape[-1] != self.dim:
            x = nn.Conv(self.dim, (1, 1),
                        strides=(self.stride, self.stride), name="proj")(x)
        return nn.relu(x + y)


class FeatureEncoder(nn.Module):
    """Stride-4 convolutional encoder (BasicEncoder lineage), dim `dim`."""

    dim: int = 128

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(T, H, W, 3) [0,1] -> (T, H/4, W/4, dim)."""
        x = frames * 2.0 - 1.0
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    name="stem")(x)
        x = nn.GroupNorm(num_groups=8, name="stem_norm")(x)
        x = nn.relu(x)
        x = ConvBlock(64, name="layer1")(x)
        x = ConvBlock(96, stride=2, name="layer2")(x)
        x = ConvBlock(self.dim, name="layer3")(x)
        return nn.Conv(self.dim, (1, 1), name="out")(x)


class UpdateBlock(nn.Module):
    """One transformer block: attention over one axis + MLP."""

    dim: int
    heads: int
    axis: str  # "time" | "track"

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens (N, T, D)."""
        n, t, d = tokens.shape
        x = tokens if self.axis == "time" else tokens.transpose(1, 0, 2)
        normed = nn.LayerNorm(name="ln1")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn"
        )(normed, normed)
        x = x + attn
        normed = nn.LayerNorm(name="ln2")(x)
        hidden = nn.Dense(4 * d, name="fc1")(normed)
        x = x + nn.Dense(d, name="fc2")(nn.gelu(hidden))
        return x if self.axis == "time" else x.transpose(1, 0, 2)


def _offset_grid(radius: int = 3) -> np.ndarray:
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)  # (49,2)


def _sincos_embed(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(..., 2) displacements -> (..., dim) sin/cos features."""
    half = dim // 4
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-np.log(1000.0) / half)
    )
    ang = x[..., None] * freqs  # (..., 2, half)
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.reshape(*x.shape[:-1], -1)


class CoTrackerLite(nn.Module):
    """Iterative point-tracking transformer."""

    dim: int = 256
    heads: int = 8
    depth: int = 3  # (time, track) block pairs
    num_scales: int = 4
    radius: int = 3
    iterations: int = 4

    @nn.compact
    def __call__(
        self,
        frames: jnp.ndarray,  # (T, H, W, 3) float [0,1]
        queries: jnp.ndarray,  # (N, 3): (t_query, x, y) pixel coords
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (tracks (T, N, 2) xy, visibility logits (T, N))."""
        t, h, w, _ = frames.shape
        n = queries.shape[0]
        fmaps = FeatureEncoder(name="encoder")(frames)  # (T, h4, w4, C)
        c = fmaps.shape[-1]
        # pyramid via repeated 2x average pooling
        pyramid = [fmaps]
        for _ in range(self.num_scales - 1):
            pyramid.append(
                nn.avg_pool(pyramid[-1], (2, 2), strides=(2, 2))
            )

        # track features sampled at the query frame/location (stride 4)
        q_xy4 = queries[:, 1:3] / 4.0
        q_t = queries[:, 0].astype(jnp.int32)
        feats_at_q = jax.vmap(
            lambda ti, xy: bilinear_sample(fmaps[ti], xy)
        )(q_t, q_xy4)  # (N, C)

        offsets = jnp.asarray(_offset_grid(self.radius))  # (K, 2)
        k = offsets.shape[0]

        def corr_features(positions):
            """positions (T, N, 2) full-res xy -> (T, N, scales*K)."""
            def per_scale(si):
                fm = pyramid[si]  # (T, hs, ws, C)
                scale = 4.0 * (2**si)

                def per_frame(fm_t, pos_t):
                    # pos_t (N, 2); sample N*K points
                    grid = pos_t[:, None, :] / scale + offsets[None]
                    sampled = bilinear_sample(
                        fm_t, grid.reshape(-1, 2)
                    ).reshape(n, k, c)
                    return jnp.einsum(
                        "nkc,nc->nk", sampled, feats_at_q
                    ) / jnp.sqrt(jnp.float32(c))

                return jax.vmap(per_frame)(fm, positions)  # (T, N, K)

            return jnp.concatenate(
                [per_scale(si) for si in range(self.num_scales)], axis=-1
            )

        corr_proj = nn.Dense(self.dim, name="corr_proj")
        flow_proj = nn.Dense(self.dim, name="flow_proj")
        track_proj = nn.Dense(self.dim, name="track_proj")
        blocks = [
            UpdateBlock(self.dim, self.heads,
                        "time" if i % 2 == 0 else "track",
                        name=f"block_{i}")
            for i in range(2 * self.depth)
        ]
        head = nn.Dense(3, name="delta_head")  # (dx, dy, dvis)

        # init: every frame starts at the query location
        pos0 = jnp.broadcast_to(queries[None, :, 1:3], (t, n, 2))
        vis0 = jnp.zeros((t, n))

        pos, vis = pos0, vis0
        for _ in range(self.iterations):
            corr = corr_features(pos)  # (T, N, S*K)
            disp = _sincos_embed((pos - pos0) / 16.0, self.dim)
            tokens = (
                corr_proj(corr) + flow_proj(disp)
                + track_proj(feats_at_q)[None]
            )  # (T, N, D)
            tokens = tokens.transpose(1, 0, 2)  # (N, T, D)
            for blk in blocks:
                tokens = blk(tokens)
            delta = head(tokens).transpose(1, 0, 2)  # (T, N, 3)
            pos = pos + delta[..., :2]
            vis = vis + delta[..., 2]

        return pos, vis


def save_params(path: str, params) -> None:
    """Flat npz checkpoint keyed by jax keystr paths."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    np.savez(
        path, **{jax.tree_util.keystr(k): np.asarray(v) for k, v in leaves}
    )


def load_params(path: str, like):
    """Restore a params pytree saved by `save_params`; `like` provides the
    tree structure (e.g. a fresh `model.init(...)`). Arrays are cast to
    the like-leaf's dtype, so f16-stored shipping npzs (save_cotracker3)
    resume as f32 training params instead of silently training in f16."""
    data = np.load(path)
    leaves_like = jax.tree_util.tree_leaves_with_path(like)
    flat = [
        jnp.asarray(data[jax.tree_util.keystr(k)], dtype=v.dtype)
        for k, v in leaves_like
    ]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), flat
    )


class CoTrackerJax:
    """STOM tracker backend driving CoTrackerLite (matches LKTracker API)."""

    def __init__(self, model: CoTrackerLite, params):
        self.model = model
        self.params = params

    def track_points(self, frames, pts, query_frame_idx):
        """Track explicit (N, 2) points; returns (tracks, vis) like
        LKTracker.track_points."""
        t = len(frames)
        if len(pts) == 0:
            return (
                np.zeros((t, 0, 2), np.float32),
                np.zeros((t, 0), bool),
            )
        video = jnp.asarray(
            np.stack(frames).astype(np.float32) / 255.0
        )
        queries = jnp.asarray(
            np.concatenate(
                [np.full((len(pts), 1), query_frame_idx, np.float32),
                 np.asarray(pts, np.float32)],
                axis=1,
            )
        )
        tracks, vis = self.model.apply(self.params, video, queries)
        return np.asarray(tracks), np.asarray(vis) > 0

    def track(self, frames, query_mask, query_frame_idx, grid_size=100):
        from .tracker import sample_grid_points_in_mask

        pts = sample_grid_points_in_mask(query_mask, grid_size)
        return self.track_points(frames, pts, query_frame_idx)
