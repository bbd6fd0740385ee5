"""High-level UniGR inference wrappers used by all benchmark drivers.

`UniGRSegmentor.segment_video` reproduces the reference eval recipe
(ref: evaluation/mevis_val_u/inference_mevis.py:156-217 + model.evaluate):
sparse K frames to the MLLM, ALL frames to SAM at 1024², teacher-forced
"<expression>? ... Sure, [SEG]." conversation, [SEG] hidden state ->
batched per-frame mask decoding, bilinear resize to the original size,
sigmoid > 0.5 threshold.

`UniGRChat.answer` is the free-form QA path (ref: inference_videoinfer.py
:277-321 — greedy, max_new_tokens).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.processor import ChatMessage, QwenVLProcessor
from ..data.templates import get_sparse_indices
from ..models.qwen25vl.positions import get_rope_index
from ..models.qwen25vl.vision import compute_vision_layout, layout_device_args
from ..models.unigr.model import UniGR
from ..data.datasets.base import sam_preprocess_frame


def eval_seg_question(
    expression: str,
    benchmark: Optional[str] = None,
    is_sent: bool = False,
) -> str:
    """Exact per-benchmark eval question the reference drivers build.

    - mevis / ytvos / davis: "Please segment the {lower(exp)} in this
      image." (ref inference_mevis.py:191-192, inference_refytvos.py:161-162,
      inference_davis.py:163-164)
    - revos: '?'-queries keep their phrasing + " Please output the
      segmentation mask."; otherwise a lowercase-initial trailing '.' is
      stripped before the segment template (ref inference_revos.py:171-180)
    - reasonvos: metadata `is_sent` selects "{exp}. Please output the
      segmentation mask." (ref inference_reason_vos.py:169-174)
    - None (demo heuristic, ref app.py:393-401): question-form queries keep
      their phrasing with the training LONG_QUESTION_LIST suffix; otherwise
      "Can you segment the … in this video?".
    """
    expr = expression
    if benchmark == "revos":
        if expr and expr[-1] == "?":
            return f"{expr} Please output the segmentation mask."
        if expr and expr[0].islower() and expr.endswith("."):
            expr = expr[:-1]
        return f"Please segment the {expr.lower()} in this image."
    if benchmark == "reasonvos":
        if is_sent:
            return f"{expr}. Please output the segmentation mask."
        return f"Please segment the {expr.lower()} in this image."
    if benchmark in ("mevis", "ytvos", "davis"):
        return f"Please segment the {expr.lower()} in this image."
    # demo heuristic (benchmark=None)
    expr = expr.strip()
    if expr.endswith("?"):
        return f"{expr} Please output segmentation mask."
    return f"Can you segment the {expr.rstrip('.').lower()} in this video?"


def build_seg_messages(
    expression: str, question: Optional[str] = None
) -> List[ChatMessage]:
    """Teacher-forced [SEG] conversation (ref inference_mevis.py:194-202).
    `question` overrides the default demo-heuristic phrasing — benchmark
    drivers pass `eval_seg_question(...)` for exact reference parity."""
    q = question if question is not None else eval_seg_question(expression)
    return [
        ChatMessage("user", [
            {"type": "video"},
            {"type": "text", "text": q},
        ]),
        ChatMessage("assistant", [{"type": "text", "text": "Sure, [SEG]."}]),
    ]


class UniGRSegmentor:
    def __init__(
        self,
        model: UniGR,
        params,
        processor: QwenVLProcessor,
        num_frames_mllm: int = 8,
        sam_chunk: int = 8,
        compute_dtype=None,
        device_preprocess: bool = False,
    ):
        """device_preprocess=True ships SAM frames to the device as
        original-resolution uint8 (~1.2 MB/frame at 480x854 vs 6.3 MB of
        host-resized bf16 at 1024²) and runs resize+normalize inside the
        jitted encode. jax.image.resize(cubic, antialias) deviates from
        the host path's PIL bicubic by ~0.4/255 mean abs on the input
        pixels (tests pin mask-level equivalence); one extra compile per
        distinct input resolution. Default keeps the host-exact PIL
        path."""
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.processor = processor
        self.num_frames_mllm = num_frames_mllm
        self.sam_chunk = sam_chunk
        self.compute_dtype = compute_dtype or jnp.float32
        self.device_preprocess = device_preprocess

        # jitted hot paths, params as ARGUMENTS (closure params would be
        # serialized into the HLO); created once so the jit cache persists
        # across videos
        cdtype = self.compute_dtype
        seg_id = model.cfg.seg.seg_token_id

        @jax.jit
        def _llm_seg(params, input_ids, position_ids, pixel_patches,
                     vision_layout):
            from ..ops.seg_gather import gather_seg_embeddings

            out = model.apply(
                params,
                input_ids=input_ids,
                position_ids=position_ids,
                pixel_patches=pixel_patches,
                vision_layout=vision_layout,
                compute_dtype=cdtype,
                method=lambda m, **kw: m.qwen(**kw),
            )
            projected = model.apply(
                params, out["hidden_states"],
                method=lambda m, h_: m.text_hidden_fcs(h_),
            )
            return gather_seg_embeddings(projected, input_ids, seg_id)

        from ..models.unigr.legacy import UniGRLegacy

        self._legacy = isinstance(model, UniGRLegacy)
        if self._legacy:
            # SAM-v1 backbone (ref model/qwen_2_5_vl.py:236-268): language
            # prompt, single-mask output, low-res logits upscaled by the
            # caller
            @jax.jit
            def _sam_encode(params, frames):
                return (
                    model.apply(
                        params, frames,
                        method=lambda m, fr: m.sam_model.encode_image(fr),
                    ),
                )

            @jax.jit
            def _sam_decode_feats(params, feats, lang):
                return model.apply(
                    params, feats[0], lang,
                    method=lambda m, e, le: (
                        m.sam_model.decode_with_language(
                            e, le, multimask_output=False
                        )
                    ),
                )["low_res_masks"]
        else:
            @jax.jit
            def _sam_encode(params, frames):
                out = model.apply(
                    params, frames,
                    method=lambda m, fr: (
                        m.grounding_encoder.forward_image(fr)
                    ),
                )
                return tuple(out["backbone_fpn"])

            @jax.jit
            def _sam_decode_feats(params, feats, lang):
                s0, s1, s2 = feats
                return model.apply(
                    params, s0, s1, s2, lang, True, False,
                    method=lambda m, a, b, c, le, mm, tr: (
                        m.grounding_encoder.decode_features_with_language(
                            a, b, c, le, multimask_output=mm, training=tr
                        )
                    ),
                )["high_res_masks"]

        sam_size = (
            model.cfg.sam1 if self._legacy else model.cfg.sam2
        ).image_size

        @jax.jit
        def _sam_encode_u8(params, frames_u8):
            # uint8 original-res frames -> resize + ImageNet normalize on
            # device, then the same encode body (host path equivalent:
            # sam_preprocess_frame, data/datasets/base.py:39-47)
            from ..ops.resize import sam_preprocess_frames_device

            x = sam_preprocess_frames_device(frames_u8, sam_size)
            return _sam_encode(params, x.astype(cdtype))

        @jax.jit
        def _sam_encode_resized_u8(params, frames_u8):
            # host-resized uint8 frames (PIL semantics preserved) ->
            # ImageNet normalize f32 + compute-dtype cast on device:
            # bit-identical to shipping host-normalized frames, at 4x
            # fewer bytes through the relay
            from ..ops.resize import sam_normalize_maybe

            return _sam_encode(
                params, sam_normalize_maybe(frames_u8).astype(cdtype)
            )

        self._llm_seg = _llm_seg
        self._sam_encode = _sam_encode
        self._sam_encode_u8 = _sam_encode_u8
        self._sam_encode_resized_u8 = _sam_encode_resized_u8
        self._sam_decode_feats = _sam_decode_feats

    def _seg_embedding(
        self, frames, expression: str, question: Optional[str] = None
    ):
        """Teacher-forced LLM pass -> ([SEG] embedding (C,), has_seg)."""
        import jax.numpy as jnp

        t_all = len(frames)
        sparse_idx = get_sparse_indices(t_all, self.num_frames_mllm)
        mllm_frames = [frames[i] for i in sparse_idx]

        msgs = build_seg_messages(expression, question=question)
        enc = self.processor(
            msgs, videos=[mllm_frames], add_generation_prompt=False
        )
        input_ids = enc["input_ids"]
        grids = enc.get("video_grid_thw", [])
        pos, _ = get_rope_index(
            self.model.cfg.qwen, input_ids,
            video_grid_thw=grids,
            second_per_grid_ts=enc.get("second_per_grid_ts"),
        )
        layout = compute_vision_layout(grids, self.model.cfg.qwen.vision)
        la = layout_device_args(layout, self.model.cfg.qwen.vision)
        seg_emb, has_seg = self._llm_seg(
            self.params,
            jnp.asarray(input_ids, jnp.int32),
            jnp.asarray(pos),
            jnp.asarray(enc["pixel_values_videos"]),
            la,
        )
        return np.asarray(seg_emb[0]), bool(np.asarray(has_seg)[0])

    def segment_video(
        self,
        frames: Sequence[np.ndarray],  # (H, W, 3) uint8 RGB, all frames
        expression: str,
        question: Optional[str] = None,
    ) -> np.ndarray:
        """Returns (T, H, W) bool masks at the original frame size."""
        return self.segment_video_multi(
            frames, [expression],
            questions=None if question is None else [question],
        )[0]

    def segment_video_multi(
        self,
        frames: Sequence[np.ndarray],
        expressions: Sequence[str],
        questions: Optional[Sequence[Optional[str]]] = None,
    ) -> np.ndarray:
        """All expressions of one video in a single pass: the SAM backbone
        encodes each frame chunk ONCE and every expression decodes against
        the shared features (the reference re-runs the full backbone per
        expression — inference_mevis.py job granularity). Returns
        (E, T, H, W) bool."""
        import jax
        import jax.numpy as jnp

        from ..ops.resize import resize_bilinear

        h, w = frames[0].shape[:2]
        t_all = len(frames)
        e_all = len(expressions)
        sam_cfg = (
            self.model.cfg.sam1 if self._legacy else self.model.cfg.sam2
        )
        sam_size = sam_cfg.image_size
        out_masks = np.zeros((e_all, t_all, h, w), bool)

        seg_embs = []
        active = []
        for ei, expr in enumerate(expressions):
            q = questions[ei] if questions is not None else None
            emb, has_seg = self._seg_embedding(frames, expr, question=q)
            if has_seg:
                seg_embs.append(emb)
                active.append(ei)
        if not active:
            return out_masks

        chunk = self.sam_chunk
        for start in range(0, t_all, chunk):
            sub = frames[start : start + chunk]
            pad = chunk - len(sub)
            if self.device_preprocess:
                sam_u8 = np.stack(sub)
                if pad:
                    sam_u8 = np.pad(
                        sam_u8, ((0, pad), (0, 0), (0, 0), (0, 0))
                    )
                feats = self._sam_encode_u8(
                    self.params, jnp.asarray(sam_u8, jnp.uint8)
                )
            else:
                sam_frames = np.stack([
                    sam_preprocess_frame(f, sam_size, normalize=False)
                    for f in sub
                ])
                if pad:
                    sam_frames = np.pad(
                        sam_frames, ((0, pad), (0, 0), (0, 0), (0, 0))
                    )
                feats = self._sam_encode_resized_u8(
                    self.params, jnp.asarray(sam_frames)
                )
            for ei, emb in zip(active, seg_embs):
                lang = jnp.broadcast_to(
                    jnp.asarray(emb)[None, None, :],
                    (chunk, 1, self.model.cfg.seg.out_dim),
                )
                masks = self._sam_decode_feats(self.params, feats, lang)
                masks = resize_bilinear(masks[:, 0], (h, w))
                masks_np = np.asarray(jax.nn.sigmoid(masks) > 0.5)
                out_masks[ei, start : start + len(sub)] = (
                    masks_np[: len(sub)]
                )
        return out_masks


class UniGRChat:
    """Free-form QA (VideoInfer / VideoRefer / ViP-Bench paths)."""

    def __init__(
        self,
        model,
        params,
        processor: QwenVLProcessor,
        max_new_tokens: int = 64,
        compute_dtype=None,
        draft_model=None,
        draft_params=None,
        spec_k: int = 4,
    ):
        import jax.numpy as jnp

        if not hasattr(model.cfg, "vision"):
            # UniGR composite: QA only needs the Qwen tower, so slice the
            # `qwen` submodule + params subtree internally (a standalone
            # Qwen25VL with the subtree is equivalent to the bound
            # submodule — linen modules are pure definitions)
            from ..models.qwen25vl.model import Qwen25VL

            model_q = Qwen25VL(model.cfg.qwen)
            params = {
                col: sub["qwen"]
                for col, sub in params.items()
                if isinstance(sub, dict) and "qwen" in sub
            }
            model = model_q
        self.model = model
        self.params = params
        self.processor = processor
        self.max_new_tokens = max_new_tokens
        self.compute_dtype = compute_dtype or jnp.bfloat16
        # optional speculative decoding (draft-and-verify; token-exact
        # greedy — generate.speculative_greedy_generate). The draft must
        # share the tokenizer; a text-only draft works for vision
        # prompts too (it just predicts from the text stream... any
        # draft is CORRECT, a blind one is merely slower), but the
        # standard pairing is a smaller Qwen2.5-VL.
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.spec_k = spec_k

    def answer(
        self,
        question: str,
        video_frames: Optional[Sequence[np.ndarray]] = None,
        images: Optional[Sequence[np.ndarray]] = None,
        suppress_ids: Sequence[int] = (),
    ) -> str:
        import jax.numpy as jnp

        from ..models.qwen25vl.generate import greedy_generate

        content: List[Dict[str, Any]] = []
        if video_frames is not None:
            content.append({"type": "video"})
        for _ in images or []:
            content.append({"type": "image"})
        content.append({"type": "text", "text": question})
        msgs = [ChatMessage("user", [c for c in content])]
        enc = self.processor(
            msgs,
            videos=[video_frames] if video_frames is not None else [],
            images=[[im] for im in (images or [])],
            add_generation_prompt=True,
        )
        grids_v = enc.get("video_grid_thw", [])
        grids_i = enc.get("image_grid_thw", [])
        qcfg = self.model.cfg  # always a Qwen config (composite sliced in
        # __init__)
        # right-pad to a 64-multiple so the jitted prefill graph is
        # reused across prompt lengths (fresh compiles cost 20-60s on
        # remote-compile backends); pads are masked via attention_mask /
        # the cache seg plane, same machinery answer_batch uses
        row = np.asarray(enc["input_ids"])[0]
        lpad = len(row) + (-len(row)) % 64
        ids_p = np.full((1, lpad), 151643, np.int64)
        mask_p = np.zeros((1, lpad), np.int64)
        ids_p[0, : len(row)] = row
        mask_p[0, : len(row)] = 1
        pos, deltas = get_rope_index(
            qcfg,
            ids_p,
            image_grid_thw=grids_i or None,
            video_grid_thw=grids_v or None,
            second_per_grid_ts=enc.get("second_per_grid_ts"),
            attention_mask=mask_p,
        )
        patches = []
        if "pixel_values" in enc:
            patches.append(enc["pixel_values"])
        if "pixel_values_videos" in enc:
            patches.append(enc["pixel_values_videos"])
        pp = np.concatenate(patches, 0) if patches else None
        la = None
        if pp is not None:
            layout = compute_vision_layout(
                list(grids_i) + list(grids_v), qcfg.vision
            )
            la = layout_device_args(layout, qcfg.vision)

        kw = dict(
            input_ids=jnp.asarray(ids_p, jnp.int32),
            attention_mask=jnp.asarray(mask_p),
            position_ids=jnp.asarray(pos),
            rope_deltas=jnp.asarray(deltas),
            max_new_tokens=self.max_new_tokens,
            eos_token_id=151645,
            pad_token_id=151643,
            pixel_patches=None if pp is None else jnp.asarray(pp),
            vision_layout=la if pp is not None else None,
            suppress_ids=suppress_ids,
            compute_dtype=self.compute_dtype,
        )
        if self.draft_model is not None:
            from ..models.qwen25vl.generate import (
                speculative_greedy_generate,
            )

            toks, _ = speculative_greedy_generate(
                self.model, self.params,
                self.draft_model, self.draft_params,
                k=self.spec_k,
                draft_pixel_patches=kw["pixel_patches"]
                if hasattr(self.draft_model.cfg, "vision") else None,
                draft_vision_layout=kw["vision_layout"]
                if hasattr(self.draft_model.cfg, "vision") else None,
                **kw,
            )
        else:
            toks = greedy_generate(self.model, self.params, **kw)
        ids = np.asarray(toks[0])
        return self._decode_row(ids)

    def _decode_row(self, ids) -> str:
        # strip pads/eos
        keep = []
        for t in ids:
            if t in (151645, 151643):
                break
            keep.append(int(t))
        return self.processor.tokenizer.decode(keep) if hasattr(
            self.processor.tokenizer, "decode"
        ) else " ".join(map(str, keep))

    def answer_batch(
        self,
        questions: Sequence[str],
        video_frames_list: Optional[Sequence[Sequence[np.ndarray]]] = None,
        images_list: Optional[Sequence[Sequence[np.ndarray]]] = None,
        suppress_ids: Sequence[int] = (),
        length_bucket: int = 64,
    ) -> List[str]:
        """One batched prefill + decode over several QA samples.

        Decode is weight-bound at batch 1, so batching multiplies eval
        samples/sec nearly linearly — the TPU answer to the reference's
        one-sample-per-GPU sharding (ref run_inference_parallel.sh).
        Modality must be homogeneous across the batch (all-video,
        all-image, or all-text): the vision-token scatter consumes tower
        outputs in patch-concatenation order, which only matches the
        flattened text order when every sample carries one modality.
        Prompt lengths are right-padded to a `length_bucket` multiple so
        the jitted prefill graph is reused across batches.
        """
        import jax.numpy as jnp

        from ..models.qwen25vl.generate import greedy_generate

        n = len(questions)
        if video_frames_list is not None and images_list is not None:
            raise ValueError(
                "answer_batch: one modality per batch (the scatter order "
                "requirement) — pass videos OR images, not both"
            )
        encs = []
        for i in range(n):
            content: List[Dict[str, Any]] = []
            vids = (
                video_frames_list[i] if video_frames_list is not None
                else None
            )
            imgs = images_list[i] if images_list is not None else None
            if vids is not None:
                content.append({"type": "video"})
            for _ in imgs or []:
                content.append({"type": "image"})
            content.append({"type": "text", "text": questions[i]})
            encs.append(self.processor(
                [ChatMessage("user", content)],
                videos=[vids] if vids is not None else [],
                images=[[im] for im in (imgs or [])],
                add_generation_prompt=True,
            ))
        qcfg = self.model.cfg
        lens = [np.asarray(e["input_ids"]).shape[1] for e in encs]
        lmax = max(lens)
        lmax += (-lmax) % max(length_bucket, 1)
        ids = np.full((n, lmax), 151643, np.int64)
        mask = np.zeros((n, lmax), np.int64)
        grids_i: List = []
        grids_v: List = []
        spg: List = []
        patches: List[np.ndarray] = []
        for i, e in enumerate(encs):
            row = np.asarray(e["input_ids"])[0]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
            grids_i += list(e.get("image_grid_thw", []) or [])
            grids_v += list(e.get("video_grid_thw", []) or [])
            spg += list(e.get("second_per_grid_ts", []) or [])
            if "pixel_values" in e:
                patches.append(np.asarray(e["pixel_values"]))
            if "pixel_values_videos" in e:
                patches.append(np.asarray(e["pixel_values_videos"]))
        pos, deltas = get_rope_index(
            qcfg, ids,
            image_grid_thw=grids_i or None,
            video_grid_thw=grids_v or None,
            second_per_grid_ts=spg or None,
            attention_mask=mask,
        )
        pp = None
        la = None
        if patches:
            layout = compute_vision_layout(
                list(grids_i) + list(grids_v), qcfg.vision
            )
            la = layout_device_args(layout, qcfg.vision)
            pp = jnp.asarray(np.concatenate(patches, 0))
        toks = greedy_generate(
            self.model, self.params,
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask),
            jnp.asarray(pos),
            jnp.asarray(deltas),
            max_new_tokens=self.max_new_tokens,
            eos_token_id=151645,
            pad_token_id=151643,
            pixel_patches=pp,
            vision_layout=la,
            suppress_ids=suppress_ids,
            compute_dtype=self.compute_dtype,
        )
        return [self._decode_row(np.asarray(toks[i])) for i in range(n)]
