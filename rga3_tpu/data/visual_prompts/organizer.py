"""Region-QA conversation organizer: rasterize per-instance visual prompts
and build the matching conversation text.

Rebuild of ref utils/visual_prompt_organizer.py (738 LoC): per-dataset
shape pools (`VISUAL_PROMPT_CONFIG`, ref :637-651), unique-color sampling
with optional random RGB (ref :710-727), shape+color phrase insertion
("within the red rectangle" — words_shape), `<region>`/`<bbox>` marker
substitution for Osprey/VCR/VG-Rel styles, and the main `vip_processor`
(ref :653-736) that overlays every instance and returns
(blended image, conversation turns).
"""
from __future__ import annotations

import random
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..templates import WORDS_SHAPE
from .generator import COLOR_POOL, image_blending

VISUAL_PROMPT_CONFIG: Dict[str, Tuple[List[str], str]] = {
    "refcocog": (["rectangle", "ellipse", "triangle", "point", "scribble",
                  "mask contour", "mask", "arrow"], ""),
    "vcr": (["rectangle", "ellipse", "triangle", "scribble",
             "mask contour", "mask", "arrow"], ""),
    "vg_rel": (["rectangle", "ellipse"], ""),
    "flickr30k": (["rectangle", "ellipse", "arrow"], ""),
    "v7w": (["rectangle"], "constant"),
    "pointQA_twice": (["rectangle"], "constant"),
    "osprey": (["rectangle", "ellipse"], ""),
    "vip_llava": (["rectangle", "ellipse", "point", "scribble", "arrow"],
                  ""),
}


def shape_phrase(color_name: Optional[str], shape: str,
                 with_preposition: bool = True) -> str:
    """'within the red rectangle' / 'the red rectangle'."""
    word1, word2 = WORDS_SHAPE[shape]
    color = f" {color_name}" if color_name else ""
    return (
        f"{word1} the{color} {word2}" if with_preposition
        else f"the{color} {word2}"
    )


def sample_shape_colors(
    n: int,
    shape_pool: Sequence[str],
    unique_colors: bool = True,
    random_rgb_prob: float = 0.5,
) -> List[Tuple[Optional[str], Tuple[int, int, int], str]]:
    """Per-instance (color_name, rgb, shape); named colors stay unique
    (ref :710-727)."""
    used = set()
    out = []
    for _ in range(n):
        shape = random.choice(list(shape_pool))
        for _ in range(20):
            if random.random() < random_rgb_prob:
                name, rgb = None, (
                    random.randint(0, 255), random.randint(0, 255),
                    random.randint(0, 255),
                )
            else:
                name, rgb = random.choice(list(COLOR_POOL.items()))
            if not unique_colors or rgb not in used:
                break
        used.add(rgb)
        out.append((name, rgb, shape))
    return out


def substitute_region_markers(
    conversations: List[Dict[str, str]],
    shape_colors: Sequence[Tuple[Optional[str], tuple, str]],
) -> List[Dict[str, str]]:
    """Replace <bbox>/<bboxN>/<regionN>/<region> markers with shape+color
    phrases (Osprey `<regN>` regex at ref :252; VCR `<bboxN>` at :233)."""
    out = []
    for turn in conversations:
        v = turn["value"]
        for i, (name, _, shape) in enumerate(shape_colors):
            phrase = shape_phrase(name, shape, with_preposition=False)
            v = re.sub(rf"<reg(?:in|ion)?{i + 1}>", phrase, v)
            v = v.replace(f"<bbox{i}>", shape_phrase(name, shape))
            v = v.replace(f"<region{i}>", phrase)
        if shape_colors:
            name0, _, shape0 = shape_colors[0]
            v = v.replace("<bbox>", shape_phrase(name0, shape0))
            v = v.replace(
                "<region>",
                shape_phrase(name0, shape0, with_preposition=False),
            )
        out.append({"from": turn["from"], "value": v})
    return out


def vip_processor(
    source: Dict,
    image,
    image_size_anchor: int = 448,
    dataset_type: Optional[str] = None,
    alpha: Optional[int] = None,
):
    """Overlay every instance prompt and return (image, conversation).

    source: {"id": "<dataset>-<sub>-...", "bboxes": [...],
             "segmentations": [... or None], "conversations": [...]}
    """
    if dataset_type is None:
        dataset_type = source["id"].split("-")[0]
    pool, style = VISUAL_PROMPT_CONFIG.get(
        dataset_type, (list(WORDS_SHAPE.keys()), "")
    )
    bboxes = source.get("bboxes", [])
    segs = source.get("segmentations") or [None] * len(bboxes)
    unique = dataset_type in {"osprey", "vcr", "vip_llava"}
    shape_colors = sample_shape_colors(
        len(bboxes), pool,
        unique_colors=True,
        random_rgb_prob=0.0 if unique else 0.5,
    )
    for (name, rgb, shape), bbox, seg in zip(shape_colors, bboxes, segs):
        image, _ = image_blending(
            image, shape=shape, bbox_coord=tuple(bbox) if bbox else None,
            segmentation=seg, rgb_value=rgb,
            image_size_anchor=image_size_anchor,
            visual_prompt_style=style, alpha=alpha,
        )
    conversation = substitute_region_markers(
        source.get("conversations", []), shape_colors
    )
    return image, conversation
