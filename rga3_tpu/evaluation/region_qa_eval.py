"""Region-QA benchmarks: VideoRefer-Bench-Q (multiple choice) and ViP-Bench
(GPT-judged region QA on single images).

Rebuilds of ref evaluation/videorefer_bench/ (ellipse overlay + STOM,
regex-letter accuracy) and evaluation/vipbench/ (bans "[SEG]"-related
tokens via SuppressTokenProcessor — ref inference_vipbench.py:98-100,
utils/utils.py:282-289; GPT-4 judge x5 runs in evaluator.py).
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from .caption_metrics import multiple_choice_accuracy


def suppress_token_ids(tokenizer, words=("[SEG]", "segmentation")) -> List[int]:
    """Token ids to ban during free-form QA decoding (ref utils.py:282-289)."""
    ids: List[int] = []
    for w in words:
        try:
            ids.extend(tokenizer(w, add_special_tokens=False)["input_ids"])
        except Exception:
            pass
    return sorted(set(ids))


def run_videorefer_inference(
    chat,
    items: Sequence[Dict],  # {"id", "frames", "question", "answer",
    # "type", "mask" (key-frame binary mask), "key_idx"}
    out_path: str,
    use_stom: bool = True,
) -> int:
    """Ellipse overlay on the key frame (+ optional STOM propagation), then
    free-form answer (ref inference_videorefer.py:30-101)."""
    from PIL import Image

    from ..data.visual_prompts import COLOR_POOL, image_blending
    from ..models.stom import STOM

    stom = STOM() if use_stom else None
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = 0
    with open(out_path, "a") as out:
        done = set()
        if os.path.exists(out_path):
            with open(out_path) as f:
                for line in f:
                    try:
                        done.add(json.loads(line)["id"])
                    except Exception:
                        pass
        for item in items:
            if item["id"] in done:
                continue
            frames = list(item["frames"])
            key = item.get("key_idx", 0)
            blended, vip = image_blending(
                Image.fromarray(frames[key]),
                shape="ellipse",
                mask=item["mask"],
                rgb_value=COLOR_POOL["red"],
                image_size_anchor=448,
                return_vip_img=True,
            )
            frames[key] = np.asarray(blended)
            if stom is not None and len(frames) > 1:
                # ndarray in -> ndarray out: no PIL round-trip
                frames = stom.propagate_in_video(
                    frames, vip, key, shape="ellipse"
                )
            pred = chat.answer(item["question"], video_frames=frames)
            out.write(json.dumps({
                "id": item["id"], "pred": pred,
                "Answer": item["answer"], "type": item.get("type", "all"),
            }) + "\n")
            n += 1
    return n


def run_videorefer_bench_q(
    chat,
    question_file: str,
    video_folder: str,
    out_path: str,
    num_frames: int = 16,
    shape: str = "ellipse",
    use_stom: bool = True,
    seed: int = 100,
) -> int:
    """The published VideoRefer-Bench-Q pipeline, reading the released
    dataset layout (ref inference_videorefer.py:26-135):

    * `question_file` — JSON list of {"video", "frame_idx", "annotation"
      (per-object dict of frame_idx -> {"segmentation": COCO RLE}),
      "Question" with <objectN><region> markers, "options", "Answer",
      "type"}.
    * `video_folder/<video>/` — per-frame image files.

    Per item: sample num_frames-1 frames by linspace + the key frame
    (duplicates kept, as the reference does), per-object distinct-color
    `shape` overlay on the key frame (video_blending_keyframes), STOM
    propagation when the overlay is non-empty, <objectN><region> ->
    "the object within {color} {shape}" substitution in question AND
    options (the reference's regex, intent-correct for multi-digit ids),
    the "Answer with the option's letter..." prompt, then greedy decode.
    Records match the reference's: {"video", "Answer", "pred": first
    char of the decoded text (:207-212), "type"} — its eval script's
    last-resort parse — plus an "idx" field for idempotent resume (the
    reference re-runs from scratch)."""
    import random
    import re

    from PIL import Image

    from ..data.visual_prompts import COLOR_POOL, video_blending_keyframes
    from ..utils import rle as rle_codec

    rng = random.Random(seed)
    stom = None
    if use_stom:
        from ..models.stom import STOM

        stom = STOM()

    with open(question_file) as f:
        data = json.load(f)

    done = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["idx"])
                except Exception:
                    pass
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = 0
    with open(out_path, "a") as out:
        for idx, line in enumerate(data):
            if idx in done:
                continue
            key_frame_idxs = [int(line["frame_idx"])]
            frames_root = os.path.join(video_folder, line["video"])
            # deviation from the reference: it indexes a raw os.listdir()
            # (inode order); frame_idx refers to temporal order, so sort
            frames_name = sorted(os.listdir(frames_root))
            indices = np.linspace(
                0, len(frames_name) - 1, num_frames - 1, dtype=int
            ).tolist()
            selected = sorted(indices + key_frame_idxs)
            frames = [
                Image.open(os.path.join(frames_root, frames_name[i]))
                .convert("RGB")
                for i in selected
            ]
            is_key = [i in key_frame_idxs for i in selected]

            question = line["Question"]
            options = list(line["options"])
            colors = rng.sample(
                list(COLOR_POOL.keys()), len(line["annotation"])
            )
            # pair annotation index oi -> oi-th marker in the question,
            # exactly as the reference does (idx_list[idx], :63,:90);
            # fall back to oi itself when an object has no <region>
            # marker (the reference would IndexError there)
            obj_ids = [
                int(i)
                for i in re.findall(r"<object(\d+)><region>", question)
            ]
            cur = frames
            for oi, anno in enumerate(line["annotation"]):
                oid = obj_ids[oi] if oi < len(obj_ids) else oi
                # only key-frame masks are consumed (blending skips
                # non-key frames; STOM works from the overlay) — skip
                # the other RLE decodes
                masks = []
                for fi, kf in zip(selected, is_key):
                    seg = (anno.get(str(fi)) or {}).get("segmentation")
                    masks.append(
                        rle_codec.decode(seg)
                        if kf and seg is not None
                        else np.zeros(1)
                    )
                color = colors[oi]
                blended, vip = video_blending_keyframes(
                    cur, masks, is_key, color, shape, return_vip_img=True
                )
                if (
                    stom is not None
                    and vip is not None
                    and (np.array(vip)[:, :, 3] > 0).any()
                ):
                    cur = stom.propagate_in_video(
                        cur, vip, is_key.index(True), shape=shape
                    )
                else:
                    cur = blended
                marker = f"the object within {color} {shape}"
                question = question.replace(
                    f"<object{oid}><region>", marker
                )
                options = [
                    o.replace(f"<object{oid}>", marker)
                    for o in options
                ]

            prompt = (
                question + "\n" + " ".join(options) + "\n"
                + "Answer with the option's letter from the given "
                "choices directly."
            )
            pred = chat.answer(
                prompt, video_frames=[np.asarray(f) for f in cur]
            )
            out.write(json.dumps({
                "idx": idx,
                "video": line["video"],
                "Answer": line["Answer"],
                "pred": pred[0] if pred else "",
                "type": line.get("type", "all"),
            }) + "\n")
            out.flush()
            n += 1
    return n


def eval_videorefer(pred_path: str) -> Dict[str, float]:
    by_type: Dict[str, List] = {}
    with open(pred_path) as f:
        for line in f:
            d = json.loads(line)
            by_type.setdefault(d.get("type", "all"), []).append(d)
    out = {}
    all_preds, all_ans = [], []
    for tp, items in by_type.items():
        preds = [d["pred"] for d in items]
        ans = [d["Answer"] for d in items]
        out[tp] = multiple_choice_accuracy(preds, ans)
        all_preds += preds
        all_ans += ans
    out["overall"] = multiple_choice_accuracy(all_preds, all_ans)
    return out


def run_vipbench_inference(
    chat,
    items: Sequence[Dict],  # {"id", "image", "question"}
    out_path: str,
    tokenizer=None,
    batch_size: int = 1,
) -> int:
    """Single-image region QA with [SEG]/segmentation tokens banned.
    batch_size > 1 packs samples through `chat.answer_batch` (decode is
    weight-bound; near-linear eval speedup).

    The answers file uses the published ViP-Bench evaluator's layout —
    a flat ``{"v1_<question_id>": "<prediction text>"}`` dict (ref
    inference_vipbench.py:157 ``results[f'v1_{question_id}']`` consumed
    by evaluator.py:168,182) — so the official evaluator reads it
    unchanged."""
    sup = suppress_token_ids(tokenizer) if tokenizer is not None else []
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    n = 0
    batched = batch_size > 1 and hasattr(chat, "answer_batch")
    pending: List[Dict] = []

    def key(item):
        return f"v1_{item['id']}"

    def flush():
        nonlocal n
        if not pending:
            return
        preds = chat.answer_batch(
            [it["question"] for it in pending],
            images_list=[[it["image"]] for it in pending],
            suppress_ids=sup,
        )
        for it, pred in zip(pending, preds):
            results[key(it)] = pred
            n += 1
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        pending.clear()

    for item in items:
        if key(item) in results:
            continue
        if batched:
            pending.append(item)
            if len(pending) >= batch_size:
                flush()
            continue
        pred = chat.answer(
            item["question"], images=[item["image"]], suppress_ids=sup
        )
        results[key(item)] = pred
        n += 1
    if batched:
        flush()
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    return n


def eval_vipbench_with_judge(
    pred_path: str,
    gts: Dict[str, Dict],  # id -> {"question", "answer"}
    judge_fn: Callable[[str, str, str], float],  # (q, gt, pred) -> score 0-10
    runs: int = 5,
) -> Dict[str, float]:
    """GPT-judge scoring, averaged over `runs` (ref evaluator.py:24-27).
    `pred_path` holds the evaluator-layout flat dict ("v1_<id>" -> text);
    `gts` may be keyed either way (bare ids get the "v1_" prefix)."""
    with open(pred_path) as f:
        preds = json.load(f)
    gts = {
        (k if k.startswith("v1_") else f"v1_{k}"): v for k, v in gts.items()
    }
    scores = []
    for pid, pred in preds.items():
        if pid not in gts:
            continue
        g = gts[pid]
        per_run = [
            judge_fn(g["question"], g["answer"], pred)
            for _ in range(runs)
        ]
        scores.append(float(np.mean(per_run)))
    return {
        "score": float(np.mean(scores)) if scores else 0.0,
        "n": len(scores),
    }
