"""VideoInfer baseline drivers (evaluation/videoinfer_baselines.py) —
the GPT-4o protocol and the local-model harness, fixture-driven
(transport is a fake; no network)."""
import json

import numpy as np
import pytest

from rga3_tpu.evaluation.videoinfer_baselines import (
    blend_key_frame, build_gpt4o_messages, parse_json_answer,
    run_gpt4o_baseline, run_local_baseline,
)


def make_items(n=3):
    rng = np.random.default_rng(0)
    overlay = np.zeros((24, 24, 4), np.uint8)
    overlay[4:12, 4:12] = (255, 0, 0, 200)
    return [
        {
            "vid_id": "vidA",
            "exp_id": "0",
            "qa_id": str(i),
            "frames": [
                rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
                for _ in range(4)
            ],
            "question": f"What is the marked object doing ({i})?",
            "vip_overlay": overlay,
            "key_idx": 1,
        }
        for i in range(n)
    ]


def test_parse_json_answer_single_and_double_quotes():
    assert parse_json_answer("{'answer': 'a cat'}") == "a cat"
    assert parse_json_answer('{"answer": "a dog"}') == "a dog"
    assert parse_json_answer("nonsense") is None
    assert parse_json_answer("{'other': 1}") is None


def test_blend_only_key_frame():
    items = make_items(1)
    out = blend_key_frame(items[0]["frames"], items[0]["vip_overlay"], 1)
    assert np.array_equal(np.asarray(out[0]), items[0]["frames"][0])
    assert not np.array_equal(np.asarray(out[1]), items[0]["frames"][1])


def test_messages_layout():
    items = make_items(1)
    frames = blend_key_frame(items[0]["frames"], None, 0)
    msgs = build_gpt4o_messages(frames, "Q?")
    assert msgs[0]["role"] == "system"
    parts = msgs[1]["content"]
    assert len(parts) == 5  # 4 frames + text
    assert all(p["type"] == "image_url" for p in parts[:4])
    assert parts[0]["image_url"]["detail"] == "high"
    assert parts[0]["image_url"]["url"].startswith(
        "data:image/jpeg;base64,"
    )
    assert parts[-1] == {"type": "text", "text": "Q?"}


def test_gpt4o_retry_escalation_and_fallback(tmp_path):
    calls = []

    def transport(messages, max_tokens, temperature):
        calls.append(temperature)
        q = messages[1]["content"][-1]["text"]
        if "(0)" in q:
            return "{'answer': 'first try'}"
        if "(1)" in q:
            # unparseable once, then valid at the escalated temperature
            return (
                "garbage" if temperature == 0.0
                else "{'answer': 'second try'}"
            )
        return "never valid"

    out = str(tmp_path / "merged_result.json")
    results = run_gpt4o_baseline(make_items(3), transport, out)
    qa = results["vidA"]["0"]
    assert qa["0"] == "first try"
    assert qa["1"] == "second try"
    assert qa["2"] == "I don't know."
    # escalation: item 1 asked at 0.0 then 0.5; item 2 at 0.0/0.5/1.0
    assert calls.count(0.0) == 3 and 0.5 in calls and 1.0 in calls
    with open(out) as f:
        assert json.load(f) == results


def test_gpt4o_transport_exception_yields_none_answer(tmp_path):
    def transport(messages, max_tokens, temperature):
        raise RuntimeError("bad request")

    out = str(tmp_path / "m.json")
    results = run_gpt4o_baseline(make_items(1), transport, out)
    # the reference's BadRequestError path: "{'answer': 'None'}" parses
    assert results["vidA"]["0"]["0"] == "None"


def test_gpt4o_resume_skips_done(tmp_path):
    out = str(tmp_path / "m.json")
    seen = []

    def transport(messages, max_tokens, temperature):
        seen.append(messages[1]["content"][-1]["text"])
        return "{'answer': 'x'}"

    run_gpt4o_baseline(make_items(2), transport, out)
    assert len(seen) == 2
    run_gpt4o_baseline(make_items(3), transport, out)
    assert len(seen) == 3  # only the new qa_id was asked


def test_local_baseline(tmp_path):
    out = str(tmp_path / "local.json")

    def answer_fn(frames, question):
        assert len(frames) == 4
        return f"ans:{question[-3]}"

    results = run_local_baseline(make_items(2), answer_fn, out)
    assert results["vidA"]["0"] == {"0": "ans:0", "1": "ans:1"}
