"""GPT-judge plumbing: ViP-Bench grading loop (resume, retry, 5-run
aggregation) and the VideoInfer batch request/response round-trip —
all through fake transports (no network)."""
import json

import numpy as np

from rga3_tpu.evaluation.gpt_judge import (
    aggregate_vipbench,
    build_videoinfer_batch_requests,
    build_vipbench_messages,
    grade_vipbench,
    parse_videoinfer_batch_outputs,
    parse_vipbench_score,
    write_batch_requests,
)

DATA = {
    "v1_1": {"question": "What is in the red box?", "answer": "a dog",
             "capability": ["rec"]},
    "v1_2": {"question": "Solve x within the circle", "answer": "-1 <AND> -5",
             "capability": ["math", "ocr"]},
}
RESULTS = {"v1_1": "a dog", "v1_2": "x = -1"}


def test_build_messages_spaces_and_or():
    msgs = build_vipbench_messages("q", "-1 <AND> -5", "x")
    assert msgs[0]["content"].endswith("q | -1  <AND>  -5 | x | ")


def test_parse_score_bounds():
    assert parse_vipbench_score("0.5") == 0.5
    assert parse_vipbench_score("1.0 because") == 1.0
    assert parse_vipbench_score("great") is None
    assert parse_vipbench_score("7.0") is None


def test_grading_loop_with_resume_and_retry(tmp_path):
    grade_file = str(tmp_path / "grades.json")
    calls = {"n": 0}

    def transport(messages, max_tokens=3, temperature=0.0):
        calls["n"] += 1
        # first-ever call returns garbage to exercise the retry path
        if calls["n"] == 1:
            return "unsure", "fake-gpt"
        return ("1.0", "fake-gpt") if "dog" in messages[0]["content"] \
            else ("0.5", "fake-gpt")

    out = grade_vipbench(DATA, RESULTS, transport, grade_file, num_run=3)
    assert set(out) == {"v1_1", "v1_2"}
    assert out["v1_1"]["score"] == [1.0, 1.0, 1.0]
    assert out["v1_2"]["score"] == [0.5, 0.5, 0.5]
    # resume: a second invocation with a dead transport must be a no-op
    def dead(*a, **k):
        raise AssertionError("should not be called after completion")

    out2 = grade_vipbench(DATA, RESULTS, dead, grade_file, num_run=3)
    assert out2 == out
    # partial resume: drop one run from one sample, only that re-runs
    partial = json.loads(open(grade_file).read())
    partial["v1_2"]["score"] = partial["v1_2"]["score"][:2]
    partial["v1_2"]["model"] = partial["v1_2"]["model"][:2]
    partial["v1_2"]["content"] = partial["v1_2"]["content"][:2]
    with open(grade_file, "w") as f:
        json.dump(partial, f)
    n = {"n": 0}

    def counting(messages, max_tokens=3, temperature=0.0):
        n["n"] += 1
        return "0.5", "fake-gpt"

    out3 = grade_vipbench(DATA, RESULTS, counting, grade_file, num_run=3)
    assert n["n"] == 1 and len(out3["v1_2"]["score"]) == 3


def test_retry_gives_zero_after_five_tries(tmp_path):
    def bad(messages, max_tokens=3, temperature=0.0):
        return "nope", "fake"

    out = grade_vipbench(
        {"a": DATA["v1_1"]}, {"a": "x"}, bad,
        str(tmp_path / "g.json"), num_run=1,
    )
    assert out["a"]["score"] == [0.0]


def test_aggregate_vipbench_capability_math():
    grades = {
        "v1_1": {"score": [1.0, 0.5]},
        "v1_2": {"score": [0.5, 0.5]},
    }
    out = aggregate_vipbench(grades, DATA, num_run=2)
    # total per run: (1.0+0.5)/2*100=75, (0.5+0.5)/2*100=50
    assert out["runs"] == [75.0, 50.0]
    np.testing.assert_allclose(out["total"], 62.5)
    # capability 'rec' only v1_1: (1.0*100 + 0.5*100)/2 = 75
    np.testing.assert_allclose(out["rec"], 75.0)
    np.testing.assert_allclose(out["math"], 50.0)


def test_videoinfer_batch_roundtrip(tmp_path):
    eval_result = {
        "vid1": {"exp0": {"qa0": {
            "question": "what color", "gt_answer": "red",
            "pred_answer": "it is red",
        }}},
        "vid2": {"exp1": {"qa3": {
            "question": "how many", "gt_answer": "two",
            "pred_answer": "three",
        }}},
    }
    reqs = build_videoinfer_batch_requests(eval_result)
    assert len(reqs) == 2
    assert reqs[0]["custom_id"] == "vid1____exp0____qa0"
    assert reqs[0]["body"]["response_format"] == {"type": "json_object"}
    assert "what color" in reqs[0]["body"]["messages"][1]["content"]
    path = tmp_path / "requests.jsonl"
    write_batch_requests(str(path), reqs)
    lines = path.read_text().strip().split("\n")
    assert len(lines) == 2 and json.loads(lines[0])["method"] == "POST"

    # fake batch responses in the API's output format
    def response(cid, content):
        return json.dumps({
            "custom_id": cid,
            "response": {"body": {"choices": [
                {"message": {"content": content}}
            ]}},
        })

    out_lines = [
        response("vid1____exp0____qa0", "{'pred': 'yes', 'score': 5}"),
        response("vid2____exp1____qa3", "{'pred': 'no', 'score': 1}"),
        response("vidX____e____q", "not a dict"),
    ]
    agg = parse_videoinfer_batch_outputs(out_lines)
    assert agg["yes_count"] == 1 and agg["no_count"] == 1
    assert agg["error_count"] == 1
    assert agg["accuracy"] == 0.5
    assert agg["average_score"] == 3.0
    assert agg["per_sample"]["vid1____exp0____qa0"]["score"] == 5


def test_batch_outputs_tolerate_failed_requests():
    lines = [
        json.dumps({"custom_id": "a", "response": None}),
        json.dumps({"custom_id": "b", "response": {"error": "rate"}}),
        json.dumps({
            "custom_id": "c",
            "response": {"body": {"choices": [
                {"message": {"content": "{'pred': 'yes', 'score': 4}"}}
            ]}},
        }),
    ]
    from rga3_tpu.evaluation.gpt_judge import parse_videoinfer_batch_outputs

    agg = parse_videoinfer_batch_outputs(lines)
    assert agg["error_count"] == 2
    assert agg["yes_count"] == 1 and agg["average_score"] == 4.0
