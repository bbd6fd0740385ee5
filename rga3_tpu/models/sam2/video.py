"""Video segmentation drivers.

Two paths, mirroring how the reference is actually used (SURVEY.md §3.2):

1. `segment_video_with_language` — the UniGR eval hot path. The reference
   prompts EVERY frame with the [SEG] language embedding as an init-cond
   frame and its `propagate_in_video` then just replays stored masks
   (ref: model/sam2.py:378-404 language_embd_inference + :4050-4132), so
   no memory attention runs. Here that becomes ONE batched jitted call over
   frame chunks instead of a per-frame Python loop.

2. `track_video` — the general SAM2 memory-propagated tracker, rebuilt as a
   `lax.scan` with a static-shape ring-buffer memory bank (7 mask memories,
   up to 16 object pointers — ref :2820-2989) replacing the reference's
   Python dict `inference_state` (:3771-3822). Frame 0 is the conditioning
   frame (language- or point-prompted); frames 1..T-1 are tracked.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import Sam2Config
from .model import Sam2Model


@functools.lru_cache(maxsize=8)
def _decode_chunk_fn(model: Sam2Model):
    """Jitted chunk decode, cached per model config (linen modules hash by
    their config): a fresh closure per video would retrace + recompile
    the full SAM2 forward for every video on the eval hot path."""

    # params as an argument (closure constants would be re-serialized into
    # the compiled graph — catastrophic for big checkpoints)
    @jax.jit
    def run(params, fr, le):
        out = model.apply(
            params, fr, le, method=Sam2Model.decode_frames_with_language
        )
        return out["high_res_masks"]

    return run


def segment_video_with_language(
    model: Sam2Model,
    params,
    frames: jnp.ndarray,  # (T, H, W, 3) normalized
    language_embd: jnp.ndarray,  # (1, C) or (T, 1, C)
    chunk: int = 8,
) -> jnp.ndarray:
    """Returns (T, 1, image, image) high-res mask logits."""
    t = frames.shape[0]
    if language_embd.ndim == 2:
        language_embd = jnp.broadcast_to(
            language_embd[None], (t, *language_embd.shape)
        )

    run = _decode_chunk_fn(model)

    outs = []
    for start in range(0, t, chunk):
        fr = frames[start : start + chunk]
        le = language_embd[start : start + chunk]
        pad = chunk - fr.shape[0]
        if pad:
            fr = jnp.pad(fr, ((0, pad), (0, 0), (0, 0), (0, 0)))
            le = jnp.pad(le, ((0, pad), (0, 0), (0, 0)))
        outs.append(run(params, fr, le)[: chunk - pad if pad else chunk])
    return jnp.concatenate(outs, axis=0)


class MemoryBank:
    """Static-shape memory state helpers (pure functions over a dict)."""

    @staticmethod
    def init(
        cfg: Sam2Config, batch: int, dtype=jnp.float32
    ) -> Dict[str, jnp.ndarray]:
        """`dtype` must match the memory-encoder output dtype: `.at[].set`
        silently casts to the BUFFER's dtype, so an f32 bank would promote
        every downstream memory-attention matmul (28.7k keys) to f32."""
        s = cfg.feat_size
        ltok = s * s
        n_ring = cfg.num_maskmem - 1
        n_ptr = cfg.max_obj_ptrs_in_encoder - 1
        return {
            # conditioning frame memory (t_pos = 0)
            "cond_feat": jnp.zeros((batch, ltok, cfg.mem_dim), dtype),
            "cond_ptr": jnp.zeros((batch, cfg.hidden_dim), dtype),
            "cond_valid": jnp.zeros((), bool),
            # the immediately previous frame (t_rel = 1 — kept regardless
            # of the eval stride, ref :2863-2870)
            "prev_feat": jnp.zeros((batch, ltok, cfg.mem_dim), dtype),
            "prev_frame": -jnp.ones((), jnp.int32),
            # ring of stride-aligned non-cond frame memories (t_rel >= 2;
            # every frame when memory_temporal_stride_for_eval == 1)
            "ring_feat": jnp.zeros(
                (n_ring, batch, ltok, cfg.mem_dim), dtype
            ),
            "ring_frame": -jnp.ones((n_ring,), jnp.int32),
            # ring of the last (max_obj_ptrs - 1) object pointers
            "ptr_ring": jnp.zeros((n_ptr, batch, cfg.hidden_dim), dtype),
            "ptr_frame": -jnp.ones((n_ptr,), jnp.int32),
        }


def wanted_memory_frame(cfg: Sam2Config, frame_idx, t_rel):
    """Frame index attended at temporal distance t_rel (>= 2), walking
    every r-th frame (ref :2871-2880; r=1 reduces to frame_idx - t_rel).
    Works on python ints and traced jnp scalars alike."""
    r = cfg.memory_temporal_stride_for_eval
    return ((frame_idx - 2) // r) * r - (t_rel - 2) * r


def ring_slot(cfg: Sam2Config, frame_idx):
    """Ring slot for a stride-aligned frame's memory. The ring keeps the
    last (num_maskmem - 1) aligned frames; collisions are impossible
    within the lookback window wanted_memory_frame can produce."""
    r = cfg.memory_temporal_stride_for_eval
    return (frame_idx // r) % (cfg.num_maskmem - 1)


def _build_memory(
    model: Sam2Model,
    params,
    cfg: Sam2Config,
    state: Dict[str, jnp.ndarray],
    frame_idx: jnp.ndarray,
    mem_pos_spatial: jnp.ndarray,  # (ltok, mem_dim) sine pos of memory feats
    maskmem_tpos_enc: jnp.ndarray,  # (num_maskmem, 1, 1, mem_dim)
):
    """Assemble the concatenated (B, Lk, mem_dim) memory bank + validity.

    Order matches the reference: cond frame first (t_pos=0), then previous
    frames earliest-to-latest (t_pos 1..num_maskmem-1), then object-pointer
    tokens (ref :2840-2961)."""
    b = state["cond_feat"].shape[0]
    ltok = state["cond_feat"].shape[1]
    n_ring = cfg.num_maskmem - 1
    n_ptr = cfg.max_obj_ptrs_in_encoder - 1
    r = cfg.hidden_dim // cfg.mem_dim

    feats = [state["cond_feat"]]
    poses = [
        mem_pos_spatial[None] + maskmem_tpos_enc[cfg.num_maskmem - 1].reshape(1, 1, -1)
    ]
    valids = [jnp.broadcast_to(state["cond_valid"], (b, ltok))]

    # previous frames: t_pos = 1..num_maskmem-1 maps to t_rel =
    # num_maskmem - t_pos frames before current. t_rel == 1 is always the
    # immediately previous frame; t_rel >= 2 walk every r-th frame, r =
    # memory_temporal_stride_for_eval (ref :2860-2890)
    for t_pos in range(1, cfg.num_maskmem):
        t_rel = cfg.num_maskmem - t_pos
        if t_rel == 1:
            want = frame_idx - 1
            feat = state["prev_feat"]
            ok = (state["prev_frame"] == want) & (want >= 0)
        else:
            want = wanted_memory_frame(cfg, frame_idx, t_rel)
            slot = ring_slot(cfg, want)
            feat = state["ring_feat"][slot]
            ok = (state["ring_frame"][slot] == want) & (want >= 0)
        feats.append(feat)
        poses.append(
            mem_pos_spatial[None]
            + maskmem_tpos_enc[t_rel - 1].reshape(1, 1, -1)
        )
        valids.append(jnp.broadcast_to(ok, (b, ltok)))

    memory = jnp.concatenate(feats, axis=1)  # (B, 7*ltok, mem_dim)
    memory_pos = jnp.concatenate(
        [jnp.broadcast_to(p, (b, ltok, cfg.mem_dim)) for p in poses], axis=1
    )
    valid = jnp.concatenate(valids, axis=1)

    # object pointers: cond ptr + previous ptrs (t_diff 1..n_ptr)
    ptrs = [state["cond_ptr"][None]]  # (1, B, C)
    ptr_ok = [state["cond_valid"][None]]
    for t_diff in range(1, cfg.max_obj_ptrs_in_encoder):
        want = frame_idx - t_diff
        slot = jnp.mod(want, n_ptr)
        ptrs.append(state["ptr_ring"][slot][None])
        ptr_ok.append(
            ((state["ptr_frame"][slot] == want) & (want >= 0))[None]
        )
    ptrs = jnp.concatenate(ptrs, axis=0)  # (n_ptr+1, B, C)
    ptr_ok = jnp.concatenate(ptr_ok, axis=0)  # (n_ptr+1,)
    ptr_tokens = model.apply(
        params, ptrs, method=Sam2Model.obj_ptrs_to_tokens
    )  # (N*r, B, mem_dim)
    num_ptr_tokens = ptr_tokens.shape[0]
    ptr_valid = jnp.repeat(ptr_ok, r)  # (N*r,)
    memory = jnp.concatenate(
        [memory, ptr_tokens.transpose(1, 0, 2)], axis=1
    )
    memory_pos = jnp.concatenate(
        [
            memory_pos,
            jnp.zeros((b, num_ptr_tokens, cfg.mem_dim), memory_pos.dtype),
        ],
        axis=1,
    )
    valid = jnp.concatenate(
        [valid, jnp.broadcast_to(ptr_valid[None], (b, num_ptr_tokens))],
        axis=1,
    )
    return memory, memory_pos, valid, num_ptr_tokens


def track_video(
    model: Sam2Model,
    params,
    frames: jnp.ndarray,  # (T, H, W, 3) normalized
    language_embd: Optional[jnp.ndarray] = None,  # (O, N, C) frame-0 prompt
    point_coords: Optional[jnp.ndarray] = None,  # (O, P, 2) frame-0 clicks
    point_labels: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Memory-propagated tracking from frame-0 prompts, O objects at once.

    The trunk encodes each frame ONCE; the per-frame memory step runs all
    objects as one batch (each with its own memory bank) — the TPU answer
    to the reference's per-object `inference_state` dicts (ref
    sam2.py:3771-3822; its own note records per-object fps loss, :3783).
    Returns {"high_res_masks": (T, O, image, image), "obj_ptrs": (T, O, C)}
    with O=1 squeezed to the legacy (T, 1, image, image) layout."""
    cfg = model.cfg
    t = frames.shape[0]
    n_obj = (
        language_embd.shape[0] if language_embd is not None
        else point_coords.shape[0]
    )

    feats = model.apply(params, frames, method=Sam2Model.forward_image)
    s0, s1, s2 = feats["backbone_fpn"]
    pos2 = feats["vision_pos_enc"][2]
    no_mem = params["params"]["no_mem_embed"]
    tpos = params["params"]["maskmem_tpos_enc"]
    s = cfg.feat_size

    def tile(x):  # one frame's features -> per-object batch
        return jnp.broadcast_to(x[None], (n_obj, *x.shape))

    # --- frame 0: init cond frame, prompt + no memory ---
    pix0 = tile(s2[0]) + no_mem.reshape(1, 1, 1, -1)
    out0 = model.apply(
        params,
        pix0,
        (tile(s0[0]), tile(s1[0])),
        language_embd,
        point_coords,
        point_labels,
        None,
        True,
        method=Sam2Model.forward_sam_heads,
    )
    mem0, mem_pos0 = model.apply(
        params, tile(s2[0]), out0["high_res_masks"].transpose(0, 2, 3, 1),
        method=Sam2Model.encode_new_memory,
    )
    # The bank rides the trunk feature dtype (bf16 under a bf16 compute
    # path, f32 in parity tests). Without these casts the f32 mask logits
    # (model.py forward_sam_heads) promote the memory-encoder output, the
    # obj pointers, and therefore the whole 28.7k-key cross-attention
    # K/V to f32.
    bank_dtype = s2.dtype
    state = MemoryBank.init(cfg, batch=n_obj, dtype=bank_dtype)
    state["cond_feat"] = mem0.reshape(n_obj, s * s, cfg.mem_dim).astype(
        bank_dtype
    )
    state["cond_ptr"] = out0["obj_ptr"].astype(bank_dtype)
    state["cond_valid"] = jnp.ones((), bool)
    mem_pos_spatial = mem_pos0.reshape(s * s, cfg.mem_dim).astype(
        bank_dtype
    )

    def step(state, inputs):
        idx, f0, f1, f2, p2 = inputs
        memory, memory_pos, valid, nptr = _build_memory(
            model, params, cfg, state, idx, mem_pos_spatial, tpos
        )
        pix = model.apply(
            params,
            tile(f2), tile(p2), memory, memory_pos, valid, nptr,
            method=Sam2Model.condition_on_memory,
        )
        out = model.apply(
            params,
            pix, (tile(f0), tile(f1)), None, None, None, None, True,
            method=Sam2Model.forward_sam_heads,
        )
        memf, _ = model.apply(
            params, tile(f2), out["high_res_masks"].transpose(0, 2, 3, 1),
            method=Sam2Model.encode_new_memory,
        )
        n_ring = cfg.num_maskmem - 1
        n_ptr = cfg.max_obj_ptrs_in_encoder - 1
        r_stride = cfg.memory_temporal_stride_for_eval
        memf = memf.reshape(n_obj, s * s, cfg.mem_dim).astype(
            state["prev_feat"].dtype
        )
        state = dict(state)
        state["prev_feat"] = memf
        state["prev_frame"] = idx
        # the t_rel >= 2 pool keeps stride-aligned frames only
        aligned = (idx % r_stride) == 0
        slot = ring_slot(cfg, idx)
        state["ring_feat"] = state["ring_feat"].at[slot].set(
            jnp.where(aligned, memf, state["ring_feat"][slot])
        )
        state["ring_frame"] = state["ring_frame"].at[slot].set(
            jnp.where(aligned, idx, state["ring_frame"][slot])
        )
        pslot = jnp.mod(idx, n_ptr)
        state["ptr_ring"] = state["ptr_ring"].at[pslot].set(
            out["obj_ptr"].astype(state["ptr_ring"].dtype)
        )
        state["ptr_frame"] = state["ptr_frame"].at[pslot].set(idx)
        return state, (out["high_res_masks"][:, 0], out["obj_ptr"])

    if t > 1:
        idxs = jnp.arange(1, t)
        _, (masks_rest, ptrs_rest) = jax.lax.scan(
            step, state, (idxs, s0[1:], s1[1:], s2[1:], pos2[1:])
        )
        masks = jnp.concatenate(
            [out0["high_res_masks"][None, :, 0], masks_rest], axis=0
        )
        ptrs = jnp.concatenate([out0["obj_ptr"][None], ptrs_rest], axis=0)
    else:
        masks = out0["high_res_masks"][None, :, 0]
        ptrs = out0["obj_ptr"][None]
    return {"high_res_masks": masks, "obj_ptrs": ptrs}
