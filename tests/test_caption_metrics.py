import numpy as np

from rga3_tpu.evaluation.caption_metrics import (
    bleu4, cider_d, evaluate_captions, meteor_lite,
    multiple_choice_accuracy, rouge_l,
)

HYP = ["a cat sits on the mat", "the dog runs fast"]
REFS = [["a cat sits on the mat"], ["a dog runs very fast"]]


def test_perfect_match_scores_high():
    assert bleu4(HYP[:1], REFS[:1]) > 0.99
    assert rouge_l(HYP[:1], REFS[:1]) > 0.99
    assert meteor_lite(HYP[:1], REFS[:1]) > 0.9


def test_partial_match_in_between():
    b = bleu4(HYP, REFS)
    assert 0.0 < b < 1.0
    r = rouge_l(HYP, REFS)
    assert 0.0 < r < 1.0


def test_disjoint_scores_zero():
    assert rouge_l(["xyz abc"], [["totally different words"]]) == 0.0
    assert meteor_lite(["xyz abc"], [["totally different words"]]) == 0.0


def test_cider_orders_quality():
    refs = [
        ["a red car parked outside the house", "red car parked outside"],
        ["a man rides a bike", "person riding a bicycle"],
        ["two birds on a wire"],
    ]
    good = ["a red car parked outside", "a man rides a bike",
            "two birds on a wire"]
    bad = ["blue sky", "green field", "nothing here"]
    assert cider_d(good, refs) > cider_d(bad, refs)


def test_evaluate_captions_bundle():
    out = evaluate_captions(HYP, REFS)
    assert set(out) == {"BLEU-4", "ROUGE-L", "CIDEr", "METEOR(exact)"}
    for v in out.values():
        assert np.isfinite(v)


def test_mc_accuracy_regex():
    preds = ["(A)", "B) something", "The answer is (C).", "Zebra"]
    answers = ["(A)", "B)", "(C)", "(D)"]
    assert multiple_choice_accuracy(preds, answers) == 0.75
