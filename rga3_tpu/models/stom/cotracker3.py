"""CoTracker3-offline (the `scaled_offline.pth` model) in JAX/flax.

The reference's STOM loads Meta's official CoTracker3 offline predictor
(ref: model/STOM.py:10-21 — `CoTrackerPredictor(checkpoint=
".../scaled_offline.pth")`, grid_size=100, segm_mask grid queries,
backward_tracking=True). This module reimplements that architecture at
the published dimensions so the official checkpoint loads through the
key-mapping converter in `convert.py` the moment the weight file is
reachable:

  * `BasicEncoder` — RAFT-style convolutional feature net, stride 4,
    instance-norm (no affine params), 4 residual stages whose outputs are
    resized to stride-4 resolution and fused (64+96+128+128 -> 256 -> 128);
  * 4-level correlation pyramid (avg-pool halving), radius 3: at each
    level a (2r+1)^2=49-point neighborhood of the current estimate is
    correlated against the track's 49-point support patch, and the 49x49
    volume is embedded by `corr_mlp` (2401 -> 384 -> 256);
  * `EfficientUpdateFormer` — hidden 384, 8 heads of 48, 3 time blocks
    (attention along the T axis per track) alternating with 3 space
    rounds (64 learned virtual tracks: virtual<-point cross-attn,
    virtual self-attn, point<-virtual cross-attn), DiT-style blocks with
    parameter-free pre-norms; flow head (->2) and joint
    visibility/confidence head (->2);
  * iterative refinement (6 iterations) with sin/cos flow embeddings and
    a sincos time embedding interpolated to the clip length; offline mode
    attends over the WHOLE clip at once, which subsumes the predictor's
    `backward_tracking=True` (queries may sit on any frame).

Dimensions that are published/structural are fixed by
`cotracker3_offline_config()`. The token-feature concatenation width of
the official build ([vis, conf, 4x256 corr, flow embedding] = 1156 with
raw-xy coords appended to the 2*64 sincos channels) is not documented,
but it IS recoverable mechanically from the checkpoint itself:
`convert.infer_config_from_state_dict` reads `input_transform`'s input
width plus the corr_mlp/fnet/updateformer tensor shapes and solves for
`flow_emb_dim`/`flow_cat_coords` (the parse is unique because the sincos
embedding needs an even channel count), so
`convert.build_cotracker3_from_checkpoint` loads `scaled_offline.pth`
correctly even if the official width differs from this default.

TPU-first notes: all shapes are static (N tracks padded to a fixed
budget, fixed 49-point stencils as dense bilinear gathers), the
refinement loop is a Python-unrolled fixed `iters`, and the whole
predictor jits as one graph.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np




@dataclasses.dataclass(frozen=True)
class CoTracker3Config:
    stride: int = 4
    latent_dim: int = 128            # fnet output channels
    corr_levels: int = 4
    corr_radius: int = 3
    corr_mlp_hidden: int = 384
    corr_mlp_out: int = 256
    hidden_size: int = 384
    num_heads: int = 8
    time_depth: int = 3
    space_depth: int = 3
    num_virtual_tracks: int = 64
    mlp_ratio: float = 4.0
    flow_emb_dim: int = 64           # C of get_2d_embedding
    flow_cat_coords: bool = True     # raw xy appended to the sincos emb
    model_resolution: Tuple[int, int] = (384, 512)
    iters: int = 6
    linear_layer_for_vis_conf: bool = True
    # "bfloat16" halves the MXU cost of the encoder/updateformer on TPU
    # (the tracker is 80% of the config-5 pipeline, STATUS r3); params
    # stay f32 (converter-compatible), norms/softmax/coordinate state
    # compute in f32. "float32" = reference-parity default.
    compute_dtype: str = "float32"

    @property
    def patch_points(self) -> int:
        return (2 * self.corr_radius + 1) ** 2

    @property
    def input_dim(self) -> int:
        # [vis, conf] + corr embeddings + flow sincos embedding (+coords)
        return 2 + self.corr_levels * self.corr_mlp_out + (
            2 * self.flow_emb_dim + (2 if self.flow_cat_coords else 0)
        )


def cotracker3_offline_config() -> CoTracker3Config:
    """The `scaled_offline.pth` dims."""
    return CoTracker3Config()


def tiny_cotracker3_config() -> CoTracker3Config:
    """CPU-testable dims, same structure."""
    return CoTracker3Config(
        latent_dim=32, corr_levels=2, corr_radius=1, corr_mlp_hidden=32,
        corr_mlp_out=24, hidden_size=64, num_heads=4, time_depth=2,
        space_depth=2, num_virtual_tracks=8, flow_emb_dim=8,
        model_resolution=(64, 96), iters=2,
    )


def cotracker3_small_config() -> CoTracker3Config:
    """The shipped-weights config: same structure as the official model
    at reduced dims and resolution, trained in-repo on the layered
    occlusion curriculum (scripts/train_cotracker.py --curriculum
    layered). Chosen so the tracker leg of the config-5 pipeline is
    cheap (model res 160x224 ~ 1/4 the official 384x512 pixels, 4
    refinement iterations instead of 6) while whole-clip attention still
    re-acquires occluded points — the capability the reference gets from
    CoTracker3's backward tracking (ref model/STOM.py:59-65)."""
    return CoTracker3Config(
        latent_dim=96, corr_levels=3, corr_radius=3, corr_mlp_hidden=256,
        corr_mlp_out=192, hidden_size=256, num_heads=8, time_depth=3,
        space_depth=3, num_virtual_tracks=48, flow_emb_dim=64,
        model_resolution=(160, 224), iters=4,
        compute_dtype="bfloat16",
    )


# -- self-describing weight files -------------------------------------------
# The shipped tracker weights embed their CoTracker3Config as JSON inside
# the npz, so loaders (STOM's default tracker, bench scripts) need no
# out-of-band dims knowledge.

_SHIPPED_WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "weights",
    "cotracker3_small.npz",
)


def save_cotracker3(path: str, params, cfg: CoTracker3Config) -> None:
    """Flat npz keyed by jax keystr paths + a `__config__` JSON entry.
    Weights are stored float16 (they are consumed in bf16/f32 compute;
    f16 storage keeps the in-repo artifact half the size at ~1e-3
    relative rounding, below the bf16 rounding of the compute path)."""
    import json as _json

    leaves = jax.tree_util.tree_leaves_with_path(params)
    arrays = {}
    for k, v in leaves:
        a = np.asarray(v)
        arrays[jax.tree_util.keystr(k)] = (
            a.astype(np.float16) if a.dtype == np.float32 else a
        )
    arrays["__config__"] = np.frombuffer(
        _json.dumps(dataclasses.asdict(cfg)).encode(), np.uint8
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_cotracker3(path: str):
    """Load a self-describing weight file -> (params, CoTracker3Config).
    Raises KeyError if the file has no embedded config (plain
    cotracker.save_params files need the `like=` loader instead)."""
    import json as _json

    data = np.load(path)
    raw = _json.loads(bytes(data["__config__"].tobytes()).decode())
    raw["model_resolution"] = tuple(raw["model_resolution"])
    cfg = CoTracker3Config(**raw)
    model = CoTracker3Offline(cfg)
    mh, mw = cfg.model_resolution
    like = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, mh, mw, 3)),
            jnp.zeros((4, 3)),
        )
    )
    leaves_like = jax.tree_util.tree_leaves_with_path(like)
    flat = [
        jnp.asarray(data[jax.tree_util.keystr(k)], v.dtype)
        for k, v in leaves_like
    ]
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), flat
    )
    return params, cfg


def shipped_tracker(path: Optional[str] = None, **predictor_kw):
    """CoTracker3Predictor over the in-repo trained weights (or an
    explicit self-describing npz). Returns None when no weight file
    exists — callers fall back to the LK tracker."""
    p = path or _SHIPPED_WEIGHTS
    if not os.path.exists(p):
        return None
    params, cfg = load_cotracker3(p)
    return CoTracker3Predictor(
        params, CoTracker3Offline(cfg), **predictor_kw
    )


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) over NHWC spatial dims (statistics
    in f32 regardless of the compute dtype)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ResidualBlock(nn.Module):
    """RAFT residual block, instance-norm variant (parameter-free norms)."""

    planes: int
    stride: int = 1
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="downsample_0")(x)
            x = instance_norm(x)
        return nn.relu(x + y)


def _resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[-1]), method="bilinear"
    )


class BasicEncoder(nn.Module):
    """CoTracker's multi-scale RAFT encoder: 4 stages resized to stride
    resolution and fused to `output_dim` channels."""

    output_dim: int = 128
    stride: int = 4
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.output_dim
        dt = self.dtype
        h, w = x.shape[1], x.shape[2]
        out_hw = (h // self.stride, w // self.stride)
        x = nn.Conv(d // 2, (7, 7), strides=2, padding=3, dtype=dt,
                    name="conv1")(x)
        x = nn.relu(instance_norm(x))
        a = ResidualBlock(d // 2, 1, dtype=dt, name="layer1_0")(x)
        a = ResidualBlock(d // 2, 1, dtype=dt, name="layer1_1")(a)
        b = ResidualBlock(d // 4 * 3, 2, dtype=dt, name="layer2_0")(a)
        b = ResidualBlock(d // 4 * 3, 1, dtype=dt, name="layer2_1")(b)
        c = ResidualBlock(d, 2, dtype=dt, name="layer3_0")(b)
        c = ResidualBlock(d, 1, dtype=dt, name="layer3_1")(c)
        e = ResidualBlock(d, 2, dtype=dt, name="layer4_0")(c)
        e = ResidualBlock(d, 1, dtype=dt, name="layer4_1")(e)
        cat = jnp.concatenate(
            [_resize_bilinear(t, out_hw) for t in (a, b, c, e)], axis=-1
        )
        y = nn.Conv(d * 2, (3, 3), padding=1, dtype=dt, name="conv2")(cat)
        y = nn.relu(instance_norm(y))
        return nn.Conv(d, (1, 1), dtype=dt, name="conv3")(y)


class Attention(nn.Module):
    """to_q / to_kv / to_out attention (CoTracker blocks.Attention)."""

    dim: int
    num_heads: int
    context_dim: Optional[int] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        ctx = x if context is None else context
        h = self.num_heads
        hd = self.dim // h
        q = nn.Dense(self.dim, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], h, hd).swapaxes(-2, -3)

        q, k, v = heads(q), heads(k), heads(v)
        att = jnp.einsum("...qd,...kd->...qk", q, k) / np.sqrt(hd)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(
            v.dtype
        )
        out = jnp.einsum("...qk,...kd->...qd", att, v)
        out = out.swapaxes(-2, -3).reshape(*x.shape[:-1], self.dim)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


def _pre_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm(elementwise_affine=False) — DiT-style parameter-free
    (statistics in f32 regardless of the compute dtype)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Mlp(nn.Module):
    hidden: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=True)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(y)


class AttnBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          name="attn")(_pre_norm(x))
        return x + Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                       name="mlp")(_pre_norm(x))


class CrossAttnBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        ctx = nn.LayerNorm(epsilon=1e-5, name="norm_context")(context)
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          name="cross_attn")(_pre_norm(x), context=ctx)
        return x + Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                       name="mlp")(_pre_norm(x))


class EfficientUpdateFormer(nn.Module):
    """Alternating time/track attention with learned virtual tracks
    (CoTracker3 updateformer; param names mirror the torch module,
    including the upstream `virual_tracks` spelling)."""

    cfg: CoTracker3Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, N, T, input_dim) -> (B, N, T, 4) [dx, dy, vis, conf]."""
        c = self.cfg
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        tokens = nn.Dense(c.hidden_size, dtype=dt,
                          name="input_transform")(x)
        b, n, t, d = tokens.shape
        virtual = self.param(
            "virual_tracks",
            nn.initializers.normal(1.0),
            (1, c.num_virtual_tracks, 1, c.hidden_size),
        )
        virtual = jnp.broadcast_to(
            virtual, (b, c.num_virtual_tracks, t, c.hidden_size)
        ).astype(tokens.dtype)
        tokens = jnp.concatenate([tokens, virtual], axis=1)
        n_tot = n + c.num_virtual_tracks

        space_every = max(1, c.time_depth // c.space_depth)
        j = 0
        for i in range(c.time_depth):
            flat = tokens.reshape(b * n_tot, t, d)
            flat = AttnBlock(
                c.hidden_size, c.num_heads, c.mlp_ratio, dtype=dt,
                name=f"time_blocks_{i}",
            )(flat)
            tokens = flat.reshape(b, n_tot, t, d)
            if i % space_every == 0 and j < c.space_depth:
                space = tokens.swapaxes(1, 2).reshape(b * t, n_tot, d)
                pts, virt = space[:, :n], space[:, n:]
                virt = CrossAttnBlock(
                    c.hidden_size, c.num_heads, c.mlp_ratio, dtype=dt,
                    name=f"space_virtual2point_blocks_{j}",
                )(virt, pts)
                virt = AttnBlock(
                    c.hidden_size, c.num_heads, c.mlp_ratio, dtype=dt,
                    name=f"space_virtual_blocks_{j}",
                )(virt)
                pts = CrossAttnBlock(
                    c.hidden_size, c.num_heads, c.mlp_ratio, dtype=dt,
                    name=f"space_point2virtual_blocks_{j}",
                )(pts, virt)
                space = jnp.concatenate([pts, virt], axis=1)
                tokens = space.reshape(b, t, n_tot, d).swapaxes(1, 2)
                j += 1

        tokens = tokens[:, :n]
        tokens = tokens.astype(jnp.float32)
        flow = nn.Dense(2, name="flow_head")(tokens)
        if c.linear_layer_for_vis_conf:
            vis_conf = nn.Dense(2, name="vis_conf_head")(tokens)
        else:
            vis_conf = jnp.zeros(flow.shape[:-1] + (2,), flow.dtype)
        return jnp.concatenate([flow, vis_conf], axis=-1)


def get_2d_embedding(xy: jnp.ndarray, dim: int,
                     cat_coords: bool = True) -> jnp.ndarray:
    """CoTracker's sincos embedding of 2-d offsets: per axis,
    interleaved sin/cos over `dim` channels, concatenated (+ raw xy)."""
    x, y = xy[..., 0:1], xy[..., 1:2]
    div = jnp.arange(0, dim, 2, dtype=jnp.float32) * (1000.0 / dim)

    def pe(v):
        s = jnp.sin(v * div)
        c = jnp.cos(v * div)
        return jnp.stack([s, c], axis=-1).reshape(*s.shape[:-1], dim)

    out = jnp.concatenate([pe(x), pe(y)], axis=-1)
    if cat_coords:
        out = jnp.concatenate([xy, out], axis=-1)
    return out


def get_1d_sincos_embed(dim: int, length: int) -> jnp.ndarray:
    """Sincos time embedding (dim must be even)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / (10000.0 ** omega)
    ang = pos * omega[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _stencil(radius: int) -> np.ndarray:
    r = np.arange(-radius, radius + 1, dtype=np.float32)
    gy, gx = np.meshgrid(r, r, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (P, 2)


def stencil_sample(
    fmap: jnp.ndarray, centers: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Bilinear samples at centers + the (2r+1)^2 integer stencil, from
    ONE (2r+2)^2 gathered patch per center. fmap (h, w, c); centers
    (N, 2) xy -> (N, P, c), P = (2r+1)^2, y-major point order (matches
    `_stencil`).

    Every stencil point shares the center's fractional offset, so the
    4-corner lerp becomes 4 shifted windows of the patch — ~3x less
    gather traffic than per-point `bilinear_sample` (4 corners x 49
    points), which profiled as ~70% of the tracker's self time.
    Identical to bilinear_sample for stencil points inside the map;
    points beyond the edge replicate the border row/col (index clamp)
    instead of collapsing the fraction (coordinate clamp) — both are
    reconstruction choices, the official sampler being unverifiable
    offline (see module docstring)."""
    h, w, c = fmap.shape
    n = centers.shape[0]
    cx = jnp.clip(centers[:, 0], 0.0, w - 1.0)
    cy = jnp.clip(centers[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(cx).astype(jnp.int32)
    y0 = jnp.floor(cy).astype(jnp.int32)
    fx = (cx - x0).astype(fmap.dtype)[:, None, None, None]
    fy = (cy - y0).astype(fmap.dtype)[:, None, None, None]
    offs = jnp.arange(-radius, radius + 2)
    xs = jnp.clip(x0[:, None] + offs[None], 0, w - 1)  # (N, S)
    ys = jnp.clip(y0[:, None] + offs[None], 0, h - 1)
    patch = fmap[ys[:, :, None], xs[:, None, :]]  # (N, S, S, c)
    p00 = patch[:, :-1, :-1]
    p01 = patch[:, :-1, 1:]
    p10 = patch[:, 1:, :-1]
    p11 = patch[:, 1:, 1:]
    out = (
        p00 * (1 - fx) * (1 - fy)
        + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy
        + p11 * fx * fy
    )
    return out.reshape(n, (2 * radius + 1) ** 2, c)


class CoTracker3Offline(nn.Module):
    """Whole-clip point tracker.

    __call__(frames (T, H, W, 3) float in [0,255], queries (N, 3)
    [t, x, y] in input-pixel coords) -> dict with tracks (iters, T, N, 2),
    vis/conf logits (T, N). The last iteration of `tracks` is the
    prediction; all iterations are returned for training supervision.
    """

    cfg: CoTracker3Config

    @nn.compact
    def __call__(self, frames: jnp.ndarray,
                 queries: jnp.ndarray) -> dict:
        c = self.cfg
        t_len, in_h, in_w, _ = frames.shape
        mh, mw = c.model_resolution
        dt = (jnp.bfloat16 if c.compute_dtype == "bfloat16"
              else jnp.float32)
        # accept uint8 frames: callers ship raw bytes to the device (4x
        # less host->device traffic through the relay — ~39 MB/clip f32
        # at 8x480x854 vs 9.8 MB uint8) and cast here
        frames = frames.astype(jnp.float32)
        video = (
            frames if (in_h, in_w) == (mh, mw)
            else _resize_bilinear(frames, (mh, mw))
        )
        video = (2.0 * (video / 255.0) - 1.0).astype(dt)

        fmaps = BasicEncoder(
            c.latent_dim, c.stride,
            dtype=dt if c.compute_dtype == "bfloat16" else None,
            name="fnet",
        )(video)

        # pyramid by 2x average pooling
        pyramid = [fmaps]
        for _ in range(c.corr_levels - 1):
            pyramid.append(nn.avg_pool(
                pyramid[-1], (2, 2), strides=(2, 2), padding="VALID"
            ))

        # queries to feature-grid coords of the model resolution
        scale = jnp.asarray(
            [mw / in_w / c.stride, mh / in_h / c.stride], jnp.float32
        )
        q_t = queries[:, 0].astype(jnp.int32)            # (N,)
        q_xy = queries[:, 1:3] * scale[None, :]          # (N, 2) grid px

        p = c.patch_points

        def sample_patches(fmap_t, centers):
            # fmap_t (h, w, C); centers (N, 2) -> (N, P, C) — one patch
            # gather per center instead of 4 corners x P points
            return stencil_sample(fmap_t, centers, c.corr_radius)

        # track support patches at the query frame, per level
        support = []
        for lvl, fm in enumerate(pyramid):
            fm_q = fm[q_t]                                # (N, h, w, C)
            centers = q_xy / (2.0 ** lvl)
            sup = jax.vmap(
                lambda f, ce: stencil_sample(
                    f, ce[None], c.corr_radius
                )[0]
            )(fm_q, centers)                              # (N, P, C)
            support.append(sup.astype(dt))

        time_emb = get_1d_sincos_embed(c.input_dim, t_len)  # (T, input_dim)

        coords = jnp.tile(q_xy[None], (t_len, 1, 1))      # (T, N, 2)
        vis = jnp.zeros((t_len, queries.shape[0]), jnp.float32)
        conf = jnp.zeros_like(vis)

        updateformer = EfficientUpdateFormer(c, name="updateformer")
        mlp_dt = dt if c.compute_dtype == "bfloat16" else None
        corr_mlp_fc1 = nn.Dense(c.corr_mlp_hidden, dtype=mlp_dt,
                                name="corr_mlp_fc1")
        corr_mlp_fc2 = nn.Dense(c.corr_mlp_out, dtype=mlp_dt,
                                name="corr_mlp_fc2")

        all_coords = []
        for _ in range(c.iters):
            coords = jax.lax.stop_gradient(coords)
            corr_embs = []
            for lvl, fm in enumerate(pyramid):
                centers = coords / (2.0 ** lvl)           # (T, N, 2)
                neigh = jax.vmap(sample_patches)(fm, centers)  # (T,N,P,C)
                vol = jnp.einsum(
                    "tnpc,nqc->tnpq", neigh.astype(dt), support[lvl],
                    preferred_element_type=jnp.float32,
                ) / np.sqrt(c.latent_dim)                  # (T, N, P, P)
                emb = corr_mlp_fc2(nn.gelu(
                    corr_mlp_fc1(vol.reshape(t_len, -1, p * p)),
                    approximate=True,
                ))
                corr_embs.append(emb)
            corr_embs = jnp.concatenate(corr_embs, axis=-1)

            flows = coords - q_xy[None]
            flows_emb = get_2d_embedding(
                flows, c.flow_emb_dim, cat_coords=c.flow_cat_coords
            )
            token = jnp.concatenate(
                [vis[..., None], conf[..., None], corr_embs, flows_emb],
                axis=-1,
            )                                              # (T, N, input)
            token = token + time_emb[:, None, :]
            delta = updateformer(
                token.swapaxes(0, 1)[None]                # (1, N, T, in)
            )[0].swapaxes(0, 1)                            # (T, N, 4)
            coords = coords + delta[..., :2]
            vis = vis + delta[..., 2]
            conf = conf + delta[..., 3]
            all_coords.append(coords)

        inv_scale = 1.0 / scale
        tracks = jnp.stack(all_coords) * inv_scale[None, None, None, :]
        return {
            "tracks": tracks,                # input-pixel coords
            "vis": vis,
            "conf": conf,
        }


class CoTracker3Predictor:
    """CoTrackerPredictor-equivalent wrapper: segm-mask grid queries on a
    chosen frame, whole-clip (bidirectional) tracking, boolean visibility
    (sigmoid(vis)*sigmoid(conf) > 0.6 as in the upstream predictor).

    track(frames, query_mask, query_frame_idx, grid_size) matches the
    STOM tracker-backend interface (tracker.py).
    """

    def __init__(self, params, model: Optional[CoTracker3Offline] = None,
                 max_points: int = 256, vis_threshold: float = 0.6,
                 pre_resize: bool = True, max_batch_clips: int = 8):
        self.model = model or CoTracker3Offline(cotracker3_offline_config())
        self.params = params
        self.max_points = max_points
        self.vis_threshold = vis_threshold
        # pre_resize: downscale frames to cfg.model_resolution on the
        # host (PIL BILINEAR ~= the model's first device op,
        # jax.image.resize bilinear+antialias, within 1/255 even on
        # noise) and ship uint8 at model resolution — at 8x480x854 this
        # halves host->device bytes again (9.8 -> 4.7 MB/clip), and the
        # relay transfer is the tracker leg's measured bottleneck
        # (~40 MB/s: 247 ms ship vs 133 ms device compute+fetch).
        # Queries/tracks are linearly rescaled; the uint8 requantization
        # (±0.002 of the [-1,1] input) sits below the bf16 rounding the
        # model applies to the normalized video anyway.
        self.pre_resize = pre_resize
        # track_batch dispatch ceiling: correlation volumes grow linearly
        # with the clip batch; 8 clips x (8, 160, 224) stays well under
        # 1 GB next to a resident 7B serving tree
        self.max_batch_clips = max(int(max_batch_clips), 1)
        self._apply = jax.jit(
            lambda p, f, q: self.model.apply(p, f, q)
        )
        # batched variant: one dispatch tracks B clips (amortizes the
        # relay's per-call latency across an eval batch); vmap over
        # (frames, queries), params broadcast
        self._apply_batch = jax.jit(jax.vmap(
            lambda p, f, q: self.model.apply(p, f, q),
            in_axes=(None, 0, 0),
        ))

    def _prep(self, frames: Sequence[np.ndarray], pts: np.ndarray,
              query_frame_idx: int):
        """Per-clip prep shared by the single and batched paths:
        point subselection, optional host pre-resize + query scaling,
        query padding to max_points. Returns
        (video (T, h, w, 3) np, q (max_points, 3) f32, n, back (2,))."""
        pts = np.asarray(pts, np.float32)
        n = min(len(pts), self.max_points)
        sel = np.linspace(0, len(pts) - 1, n).astype(int)
        pts = pts[sel]

        in_h, in_w = frames[0].shape[:2]
        mh, mw = self.model.cfg.model_resolution
        back = np.ones(2, np.float32)
        if (
            self.pre_resize
            and (in_h, in_w) != (mh, mw)
            and frames[0].dtype == np.uint8  # PIL path; f32 ships as-is
        ):
            from PIL import Image

            frames = [
                np.asarray(
                    Image.fromarray(np.ascontiguousarray(f)).resize(
                        (mw, mh), Image.BILINEAR
                    )
                )
                for f in frames
            ]
            fwd = np.asarray([mw / in_w, mh / in_h], np.float32)
            back = np.asarray([in_w / mw, in_h / mh], np.float32)
            pts = pts * fwd[None, :]

        pad = self.max_points - n
        q = np.concatenate(
            [np.full((len(pts), 1), query_frame_idx, np.float32), pts],
            axis=-1,
        )
        if pad:
            q = np.concatenate([q, np.tile(q[-1:], (pad, 1))], axis=0)
        return np.stack(frames), q, n, back

    def _finish(self, out_tracks, out_vis, out_conf, n: int,
                back: np.ndarray):
        """Last-iteration (T, P, 2) tracks + (T, P) vis/conf ->
        (tracks (T, n, 2) in input-pixel coords, visible (T, n) bool)."""
        tracks = np.asarray(out_tracks)[:, :n] * back[None, None, :]
        # overflow-safe sigmoid (raw logits can be large early in
        # training; tanh form never overflows)
        vis_p = 0.5 * (1.0 + np.tanh(0.5 * np.asarray(out_vis)))
        conf_p = 0.5 * (1.0 + np.tanh(0.5 * np.asarray(out_conf)))
        visible = (vis_p * conf_p)[:, :n] > self.vis_threshold
        return tracks.astype(np.float32), visible

    def track_points(self, frames: Sequence[np.ndarray], pts: np.ndarray,
                     query_frame_idx: int):
        """Track explicit (N, 2) points (padded/truncated to max_points
        for a stable jit shape); returns (tracks (T, N, 2), vis)."""
        t = len(frames)
        if len(pts) == 0:
            return (np.zeros((t, 0, 2), np.float32),
                    np.zeros((t, 0), bool))
        # ship the frames in their native dtype (uint8 from the STOM
        # driver) — the model casts on device
        video, q, n, back = self._prep(frames, pts, query_frame_idx)
        out = self._apply(
            self.params, jnp.asarray(video), jnp.asarray(q)
        )
        # [-1] slices the last refinement iteration ON DEVICE, so only
        # (T, P, 2) rides the relay back, not (iters, T, P, 2)
        return self._finish(out["tracks"][-1], out["vis"], out["conf"],
                            n, back)

    @staticmethod
    def _mask_points(query_mask: np.ndarray, grid_size: int):
        from .tracker import sample_grid_points_in_mask

        pts = sample_grid_points_in_mask(query_mask, grid_size)
        if len(pts) == 0:
            ys, xs = np.nonzero(query_mask)
            if len(ys) == 0:
                return np.zeros((0, 2), np.float32)
            pts = np.stack([xs, ys], -1).astype(np.float32)[:1]
        return pts

    def track(self, frames: Sequence[np.ndarray], query_mask: np.ndarray,
              query_frame_idx: int, grid_size: int = 100):
        pts = self._mask_points(query_mask, grid_size)
        if len(pts) == 0:
            t = len(frames)
            return (np.zeros((t, 0, 2), np.float32),
                    np.zeros((t, 0), bool))
        return self.track_points(frames, pts, query_frame_idx)

    def track_batch(
        self,
        frames_list: Sequence[Sequence[np.ndarray]],
        masks: Sequence[np.ndarray],
        query_frame_idxs: Sequence[int],
        grid_size: int = 100,
    ):
        """Track B clips in ONE device dispatch (vmapped apply) — the
        relay's per-call transfer+latency dominates the tracker leg, so
        batching an eval batch's clips amortizes it. Clips must share a
        frame count; with pre_resize their resolutions may differ (all
        land at model_resolution). Returns a list of (tracks, vis)."""
        b = len(frames_list)
        results: List = [None] * b
        preps = []
        live = []
        for i in range(b):
            pts = self._mask_points(masks[i], grid_size)
            t = len(frames_list[i])
            if len(pts) == 0:
                results[i] = (np.zeros((t, 0, 2), np.float32),
                              np.zeros((t, 0), bool))
                continue
            preps.append(
                self._prep(frames_list[i], pts, query_frame_idxs[i])
            )
            live.append(i)
        if not live:
            return results
        shapes = {p[0].shape for p in preps}
        if len(shapes) > 1:
            # ragged T or (without pre_resize) mixed resolutions: fall
            # back to per-clip dispatch
            for i, (video, q, n, back) in zip(live, preps):
                out = self._apply(
                    self.params, jnp.asarray(video), jnp.asarray(q)
                )
                results[i] = self._finish(
                    out["tracks"][-1], out["vis"], out["conf"], n, back
                )
            return results
        # dispatch in chunks of max_batch_clips: the correlation volumes
        # scale linearly with the clip batch ((B, T, P, 49, 49) f32 per
        # level), and an unbounded batch next to a resident 7B serving
        # tree OOMs the 16 GB chip at B=16.
        # ALL chunks are enqueued before any result is fetched: JAX
        # dispatch is async, so chunk k+1's host->device frame transfer
        # (the tracker leg's measured bottleneck through the ~40 MB/s
        # relay) streams while the device computes chunk k; queued
        # executions hold only their input buffers (a few MB of uint8
        # frames each), not their correlation volumes.
        pending = []
        for c0 in range(0, len(live), self.max_batch_clips):
            chunk = slice(c0, c0 + self.max_batch_clips)
            c_live = live[chunk]
            c_preps = preps[chunk]
            videos = jnp.asarray(np.stack([p[0] for p in c_preps]))
            qs = jnp.asarray(np.stack([p[1] for p in c_preps]))
            out = (
                self._apply_batch(self.params, videos, qs)
                if len(c_preps) > 1
                else {k: v[None] for k, v in self._apply(
                    self.params, videos[0], qs[0]
                ).items()}
            )
            pending.append((c_live, c_preps, out))
        for c_live, c_preps, out in pending:
            # [:, -1] slices the last refinement iteration ON DEVICE —
            # only (B, T, P, 2) rides the relay back
            tracks_np = np.asarray(out["tracks"][:, -1])
            vis_np = np.asarray(out["vis"])
            conf_np = np.asarray(out["conf"])
            for j, i in enumerate(c_live):
                _, _, n, back = c_preps[j]
                results[i] = self._finish(
                    tracks_np[j], vis_np[j], conf_np[j], n, back
                )
        return results
