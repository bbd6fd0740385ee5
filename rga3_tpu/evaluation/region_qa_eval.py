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
                pil = [Image.fromarray(f) for f in frames]
                frames = [
                    np.asarray(f)
                    for f in stom.propagate_in_video(
                        pil, vip, key, shape="ellipse"
                    )
                ]
            pred = chat.answer(item["question"], video_frames=frames)
            out.write(json.dumps({
                "id": item["id"], "pred": pred,
                "Answer": item["answer"], "type": item.get("type", "all"),
            }) + "\n")
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
    weight-bound; near-linear eval speedup)."""
    sup = suppress_token_ids(tokenizer) if tokenizer is not None else []
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    n = 0
    batched = batch_size > 1 and hasattr(chat, "answer_batch")
    pending: List[Dict] = []

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
            results[str(it["id"])] = {"answer": pred}
            n += 1
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        pending.clear()

    for item in items:
        if str(item["id"]) in results:
            continue
        if batched:
            pending.append(item)
            if len(pending) >= batch_size:
                flush()
            continue
        pred = chat.answer(
            item["question"], images=[item["image"]], suppress_ids=sup
        )
        results[str(item["id"])] = {"answer": pred}
        n += 1
    if batched:
        flush()
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    return n


def eval_vipbench_with_judge(
    pred_path: str,
    gts: Dict[str, Dict],  # id -> {"question", "answer"}
    judge_fn: Callable[[str, str, str], float],  # (q, gt, pred) -> score 0-10
    runs: int = 5,
) -> Dict[str, float]:
    """GPT-judge scoring, averaged over `runs` (ref evaluator.py:24-27)."""
    with open(pred_path) as f:
        preds = json.load(f)
    scores = []
    for pid, d in preds.items():
        if pid not in gts:
            continue
        g = gts[pid]
        per_run = [
            judge_fn(g["question"], g["answer"], d["answer"])
            for _ in range(runs)
        ]
        scores.append(float(np.mean(per_run)))
    return {
        "score": float(np.mean(scores)) if scores else 0.0,
        "n": len(scores),
    }
