"""Host-side Qwen2.5-VL processor: chat templating, smart resize, pixel
patchification, and the [SEG]-extended tokenizer.

Rebuild of the external `AutoProcessor` + `qwen_vl_utils.process_vision_info`
pipeline the reference drives in its collate (ref: utils/dataset.py:73-104)
and eval scripts. The tokenizer itself loads from the HF tokenizer files via
`transformers.AutoTokenizer` when a model dir is available (tokenization is
host-side data prep, as in the reference); everything else here is
self-contained numpy.

Key numerics (must match HF for checkpoint parity):
  * smart_resize: round H,W to multiples of patch*merge (28), keeping the
    pixel count within [min_pixels, max_pixels] via sqrt scaling.
  * normalization: OPENAI CLIP mean/std on [0,1] RGB.
  * patchify: temporal groups of 2 frames; patch layout (grid_h/2, grid_w/2,
    2, 2) merge-unit order; channel-major features per patch
    (C, T, ph, pw) flattened.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

SEG_TOKEN = "[SEG]"

CHAT_TEMPLATE_PREFIX = (
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
)


def smart_resize(
    height: int,
    width: int,
    factor: int = 28,
    min_pixels: int = 4 * 28 * 28,
    max_pixels: int = 16384 * 28 * 28,
) -> Tuple[int, int]:
    """HF qwen_vl_utils.smart_resize."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def _resize_bicubic(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """(H, W, 3) uint8/float -> resized float32, PIL bicubic when available."""
    try:
        from PIL import Image

        pil = Image.fromarray(img.astype(np.uint8))
        pil = pil.resize((size[1], size[0]), Image.BICUBIC)
        return np.asarray(pil, dtype=np.float32)
    except Exception:
        # nearest fallback (tests without PIL)
        ys = (np.arange(size[0]) * img.shape[0] / size[0]).astype(int)
        xs = (np.arange(size[1]) * img.shape[1] / size[1]).astype(int)
        return img[ys][:, xs].astype(np.float32)


def preprocess_frames(
    frames: Sequence[np.ndarray],
    min_pixels: int,
    max_pixels: int,
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    normalize: bool = True,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Frames (each (H, W, 3) RGB uint8) -> (patches (L, C*tps*ps*ps),
    grid_thw). Images are a single frame (tiled to temporal_patch_size).

    Matches Qwen2VLImageProcessor._preprocess patch extraction order.

    normalize=False skips the CLIP mean/std step and returns UINT8
    patches (the resize output is integer-valued, so this is lossless):
    4x fewer host->device bytes, with `(x - mean) / std` applied on
    device by the vision tower in the same f32 ops — bit-identical to
    the f32 path (tests/test_processor.py pins it).
    """
    factor = patch_size * merge_size
    h, w = frames[0].shape[:2]
    rh, rw = smart_resize(h, w, factor, min_pixels, max_pixels)
    mean = np.asarray(OPENAI_CLIP_MEAN, np.float32) * 255.0
    std = np.asarray(OPENAI_CLIP_STD, np.float32) * 255.0

    proc = []
    for f in frames:
        x = _resize_bicubic(f, (rh, rw))
        if normalize:
            x = (x - mean) / std
        proc.append(x.transpose(2, 0, 1))  # (C, H, W)
    arr = np.stack(proc)  # (T, C, H, W)
    t = arr.shape[0]
    if t % temporal_patch_size != 0:
        arr = np.concatenate(
            [arr, arr[-1:].repeat(temporal_patch_size - t % temporal_patch_size, 0)]
        )
        t = arr.shape[0]

    grid_t = t // temporal_patch_size
    grid_h, grid_w = rh // patch_size, rw // patch_size
    c = arr.shape[1]
    # HF Qwen2VLImageProcessor patch extraction order:
    patches = arr.reshape(
        grid_t, temporal_patch_size, c,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = patches.reshape(
        grid_t * grid_h * grid_w,
        c * temporal_patch_size * patch_size * patch_size,
    )
    out_dtype = np.float32 if normalize else np.uint8
    return patches.astype(out_dtype), (grid_t, grid_h, grid_w)


@dataclass
class ChatMessage:
    role: str
    # list of parts: {"type": "text", "text": ...} |
    # {"type": "image"|"video", ...}
    content: List[Dict[str, Any]]


def render_chat(
    messages: Sequence[ChatMessage],
    add_generation_prompt: bool = True,
) -> str:
    """Qwen2.5 chat template with vision placeholders. The per-grid token
    counts are substituted later by `expand_vision_tokens`."""
    out = []
    has_system = any(m.role == "system" for m in messages)
    if not has_system:
        out.append(CHAT_TEMPLATE_PREFIX)
    for m in messages:
        out.append(f"<|im_start|>{m.role}\n")
        for part in m.content:
            if part.get("type") == "text":
                out.append(part["text"])
            elif part.get("type") == "image":
                out.append("<|vision_start|><|image_pad|><|vision_end|>")
            elif part.get("type") == "video":
                out.append("<|vision_start|><|video_pad|><|vision_end|>")
        out.append("<|im_end|>\n")
    if add_generation_prompt:
        out.append("<|im_start|>assistant\n")
    return "".join(out)


def expand_vision_tokens(
    text: str,
    image_grids: Sequence[Tuple[int, int, int]] = (),
    video_grids: Sequence[Tuple[int, int, int]] = (),
    merge_unit: int = 4,
) -> str:
    """Replace each <|image_pad|>/<|video_pad|> with grid_t*h*w/4 copies."""
    for t, h, w in image_grids:
        n = t * h * w // merge_unit
        text = text.replace("<|image_pad|>", "<|placeholder|>" * n, 1)
    for t, h, w in video_grids:
        n = t * h * w // merge_unit
        text = text.replace("<|video_pad|>", "<|videoplaceholder|>" * n, 1)
    return (
        text.replace("<|placeholder|>", "<|image_pad|>")
        .replace("<|videoplaceholder|>", "<|video_pad|>")
    )


class WordTokenizer:
    """Minimal word-level tokenizer with the real Qwen special-token ids —
    for smoke runs and tests without HF tokenizer files on disk."""

    SPECIALS = {
        "<|im_start|>": 151644,
        "<|im_end|>": 151645,
        "<|endoftext|>": 151643,
        "<|vision_start|>": 151652,
        "<|vision_end|>": 151653,
        "<|image_pad|>": 151655,
        "<|video_pad|>": 151656,
        # MUST be inside every model's vocab: 3B ties embeddings at
        # vocab 151936, and an OOB id is a clamped gather on CPU but
        # UNDEFINED on TPU (garbage/NaN embedding row — an all-NaN 3B
        # train forward traced back to exactly this). 151665 mirrors
        # where the real tokenizer's add_tokens([SEG]) lands (first free
        # id after the Qwen specials), < 151936 and < 152064.
        SEG_TOKEN: 151665,
        "user": 872,
        "assistant": 77091,
    }
    pad_token_id = 151643

    def convert_tokens_to_ids(self, tok: str) -> int:
        return self.SPECIALS.get(tok, abs(hash(tok)) % 50000 + 1000)

    def __call__(self, text: str, add_special_tokens: bool = False):
        import re as _re

        pattern = "|".join(
            _re.escape(s) for s in self.SPECIALS if s.startswith("<")
            or s == SEG_TOKEN
        )
        ids = []
        for part in _re.split(f"({pattern})", text):
            if not part:
                continue
            if part in self.SPECIALS:
                ids.append(self.SPECIALS[part])
            else:
                for w in part.replace("\n", " \n ").split(" "):
                    if w:
                        ids.append(self.convert_tokens_to_ids(w))
        return {"input_ids": ids}

    def decode(self, ids) -> str:
        inv = {v: k for k, v in self.SPECIALS.items()}
        return " ".join(inv.get(int(i), f"tok{int(i)}") for i in ids)


class QwenVLProcessor:
    """Tokenizer + vision preprocessing. Needs an HF tokenizer dir for real
    text; tests can use `DummyTokenizer`."""

    def __init__(
        self,
        tokenizer,
        min_pixels: int = 4 * 28 * 28,
        max_pixels: int = 1280 * 28 * 28,
        video_max_pixels: int = 320 * 28 * 28,
        tokens_per_second: int = 2,
        ship_uint8: bool = True,
    ):
        self.tokenizer = tokenizer
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.video_max_pixels = video_max_pixels
        self.tokens_per_second = tokens_per_second
        # ship_uint8: emit UINT8 pixel values (CLIP normalization runs
        # on device in the vision tower, bit-identical) — 4x fewer bytes
        # through the host->device relay on the serving/eval path
        self.ship_uint8 = ship_uint8

    @classmethod
    def from_pretrained(cls, model_dir: str, **kw):
        if model_dir == "dummy":
            return cls(WordTokenizer(), **kw)
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_dir)
        if SEG_TOKEN not in tok.get_vocab():
            tok.add_tokens(SEG_TOKEN)
        return cls(tok, **kw)

    @property
    def seg_token_id(self) -> int:
        return self.tokenizer.convert_tokens_to_ids(SEG_TOKEN)

    def __call__(
        self,
        messages: Sequence[ChatMessage],
        images: Sequence[Sequence[np.ndarray]] = (),
        videos: Sequence[Sequence[np.ndarray]] = (),
        video_fps: float = 2.0,
        add_generation_prompt: bool = True,
    ) -> Dict[str, Any]:
        norm = not self.ship_uint8
        image_patches, image_grids = [], []
        for frames in images:
            p, g = preprocess_frames(
                list(frames), self.min_pixels, self.max_pixels,
                normalize=norm,
            )
            image_patches.append(p)
            image_grids.append(g)
        video_patches, video_grids = [], []
        for frames in videos:
            p, g = preprocess_frames(
                list(frames), self.min_pixels, self.video_max_pixels,
                normalize=norm,
            )
            video_patches.append(p)
            video_grids.append(g)

        text = render_chat(messages, add_generation_prompt)
        text = expand_vision_tokens(text, image_grids, video_grids)
        ids = np.asarray(
            self.tokenizer(text, add_special_tokens=False)["input_ids"],
            np.int32,
        )
        out: Dict[str, Any] = {
            "input_ids": ids[None],
            "attention_mask": np.ones((1, len(ids)), np.int64),
            "text": text,
        }
        if image_patches:
            out["pixel_values"] = np.concatenate(image_patches, 0)
            out["image_grid_thw"] = image_grids
        if video_patches:
            out["pixel_values_videos"] = np.concatenate(video_patches, 0)
            out["video_grid_thw"] = video_grids
            out["second_per_grid_ts"] = [2.0 / video_fps] * len(video_grids)
        return out
