"""VideoInfer benchmark: region-level video QA with visual prompts.

Rebuild of ref evaluation/videoinfer/{inference_videoinfer.py, merge.py,
eval.py}: per-shard prediction JSONs (idempotent resume), merge, then
BLEU-4/CIDEr/METEOR/ROUGE-L (+ optional sentence-similarity / GPT judge via
pluggable callables). STOM propagation optional (--use_stom equivalent).
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..data.templates import REFERRING_VQA_PROMPT
from .caption_metrics import evaluate_captions


def run_inference(
    chat,  # UniGRChat-compatible: .answer(question, video_frames=...)
    items: Sequence[Dict],  # [{"id", "video_dir"/"frames", "question",
    # "vip_overlay" (RGBA np or None), "key_idx"}]
    out_path: str,
    use_stom: bool = True,
    subset_idx: int = 0,
    subset_num: int = 1,
    batch_size: int = 1,
) -> int:
    """Writes {"id", "pred"} JSON lines; resumes past existing ids.

    batch_size > 1 runs the decode through `chat.answer_batch` — decode
    is weight-bound at batch 1, so eval throughput scales near-linearly
    with the batch (the reference instead shards one sample per GPU) —
    and overlaps STOM propagation of batch k+1 with the decode of
    batch k (the tracker leg is relay-transfer-bound; the decode leaves
    the host->device link idle)."""
    from PIL import Image

    done_ids = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    done_ids.add(json.loads(line)["id"])
                except Exception:
                    pass
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = 0
    stom = None
    if use_stom:
        from ..models.stom import STOM

        stom = STOM()

    def prepare(item, pre_propagated=None):
        frames = item["frames"]  # list of np RGB
        overlay = item.get("vip_overlay")
        if overlay is not None:
            key = item.get("key_idx", 0)
            if pre_propagated is not None:
                frames = pre_propagated
            elif stom is not None:
                # ndarray in -> ndarray out: no PIL round-trip
                frames = stom.propagate_in_video(
                    list(frames), overlay, key,
                    shape=item.get("shape", "rectangle"),
                )
            else:
                base = Image.fromarray(frames[key]).convert("RGBA")
                vip = Image.fromarray(overlay, "RGBA")
                frames = list(frames)
                frames[key] = np.asarray(
                    Image.alpha_composite(base, vip).convert("RGB")
                )
        question = REFERRING_VQA_PROMPT.format(text=item["question"])
        return question, frames

    def stom_props(batch: List) -> Dict[int, List[np.ndarray]]:
        """One tracker dispatch for the whole batch's overlays
        (CoTracker3Predictor.track_batch; the per-call relay latency
        dominates the tracker leg). Returns {row_idx: propagated}."""
        todo = [
            (j, it) for j, it in enumerate(batch)
            if stom is not None
            and it.get("vip_overlay") is not None
        ]
        if not todo:
            return {}
        outs = stom.propagate_in_video_batch([
            {
                "frames": list(it["frames"]),
                "vip": it["vip_overlay"],
                "key_idx": it.get("key_idx", 0),
                "shape": it.get("shape", "rectangle"),
            }
            for _, it in todo
        ])
        return {j: o for (j, _), o in zip(todo, outs)}

    batched = batch_size > 1 and hasattr(chat, "answer_batch")
    todo_items = [
        item for i, item in enumerate(items)
        if i % subset_num == subset_idx and item["id"] not in done_ids
    ]
    with open(out_path, "a") as out:
        if batched:
            # STOM for batch k+1 runs on a worker thread WHILE the chat
            # decodes batch k: the tracker leg is relay-transfer-bound
            # (frames ship at ~40 MB/s) and the QA leg is device-bound
            # with an idle link, so a one-deep lookahead hides most of
            # the STOM cost (JAX dispatch is thread-safe; the device
            # serializes the tracker's small compute after the decode).
            from concurrent.futures import ThreadPoolExecutor

            batches = [
                todo_items[k : k + batch_size]
                for k in range(0, len(todo_items), batch_size)
            ]
            with ThreadPoolExecutor(max_workers=1) as ex:
                fut = ex.submit(stom_props, batches[0]) if batches else None
                for k, batch in enumerate(batches):
                    props = fut.result()
                    fut = (
                        ex.submit(stom_props, batches[k + 1])
                        if k + 1 < len(batches) else None
                    )
                    rows = [
                        prepare(it, pre_propagated=props.get(j))
                        for j, it in enumerate(batch)
                    ]
                    preds = chat.answer_batch(
                        [q for q, _ in rows],
                        video_frames_list=[f for _, f in rows],
                    )
                    for it, pred in zip(batch, preds):
                        out.write(
                            json.dumps({"id": it["id"], "pred": pred})
                            + "\n"
                        )
                        n += 1
                    out.flush()
        else:
            for item in todo_items:
                question, frames = prepare(item)
                pred = chat.answer(question, video_frames=frames)
                out.write(
                    json.dumps({"id": item["id"], "pred": pred}) + "\n"
                )
                out.flush()
                n += 1
    return n


def merge_shards(shard_paths: Sequence[str], out_path: str) -> int:
    """ref evaluation/videoinfer/merge.py."""
    seen = {}
    for p in shard_paths:
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for line in f:
                try:
                    d = json.loads(line)
                    seen[d["id"]] = d
                except Exception:
                    pass
    with open(out_path, "w") as f:
        for d in seen.values():
            f.write(json.dumps(d) + "\n")
    return len(seen)


def build_eval_result(
    pred_path: str,
    qa_data: Dict[str, Dict],
) -> Dict[str, Dict]:
    """Predictions (jsonl, ids 'vid____exp____qa') + the nested test.json
    -> the eval_result.json layout consumed by the GPT batch judge
    (ref eval_gpt.ipynb cell 1: eval_result[vid][exp][qa] =
    {question, gt_answer, pred_answer})."""
    preds = {}
    with open(pred_path) as f:
        for line in f:
            try:
                d = json.loads(line)
                preds[d["id"]] = d["pred"]
            except Exception:
                pass
    out: Dict[str, Dict] = {}
    for vid, v in qa_data.items():
        for exp_id, exp in v["expressions"].items():
            for qa_id, qa in exp["QA"].items():
                pid = f"{vid}____{exp_id}____{qa_id}"
                if pid not in preds:
                    continue
                out.setdefault(vid, {}).setdefault(exp_id, {})[qa_id] = {
                    "question": qa["Q"],
                    "gt_answer": qa.get("A", ""),
                    "pred_answer": preds[pid],
                }
    return out


def run_eval(
    pred_path: str,
    answers: Dict[str, str],  # id -> ground-truth answer
    sentence_similarity_fn: Optional[Callable] = None,
    gpt_judge_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    hyps, refs, items = [], [], []
    with open(pred_path) as f:
        for line in f:
            d = json.loads(line)
            if d["id"] not in answers:
                continue
            hyps.append(d["pred"])
            refs.append([answers[d["id"]]])
            items.append(d)
    out = evaluate_captions(
        hyps, refs, sentence_similarity_fn=sentence_similarity_fn
    )
    out["n"] = len(hyps)
    if gpt_judge_fn is not None:
        scores = [
            gpt_judge_fn(h, r[0]) for h, r in zip(hyps, refs)
        ]
        out["GPT-acc"] = float(np.mean([s.get("acc", 0) for s in scores]))
        out["GPT-score"] = float(np.mean([s.get("score", 0) for s in scores]))
    return out
