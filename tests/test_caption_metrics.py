import numpy as np

from rga3_tpu.evaluation.caption_metrics import (
    bleu4, cider_d, evaluate_captions, meteor, meteor_align, meteor_lite,
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
    assert set(out) == {
        "BLEU-4", "ROUGE-L", "CIDEr", "METEOR", "METEOR(exact)"
    }
    for v in out.values():
        assert np.isfinite(v)


# ---- full METEOR (align/penalty stages), hand-computed expectations ----

def test_meteor_identical_sentence():
    # m=6, P=R=1, Fmean=1, one chunk: penalty = 0.5 * (1/6)^3
    got = meteor(["the cat sat on the mat"], [["the cat sat on the mat"]])
    np.testing.assert_allclose(got, 1.0 - 0.5 * (1 / 6) ** 3, atol=1e-9)


def test_meteor_stem_stage_matches_morphology():
    # exact matches only "the"; the stem stage adds cats~cat,
    # running~runs -> m=3 over len 3/3, one contiguous chunk:
    # score = 1 * (1 - 0.5 * (1/3)^3)
    got = meteor(["the cats running"], [["the cat runs"]])
    np.testing.assert_allclose(got, 1.0 - 0.5 * (1 / 3) ** 3, atol=1e-9)
    # without the stem stage only "the" matches: P=R=1/3,
    # Fmean=1/3, 1 chunk of 1 match -> penalty=0.5
    got_exact = meteor(["the cats running"], [["the cat runs"]],
                       stages=("exact",))
    np.testing.assert_allclose(got_exact, (1 / 3) * 0.5, atol=1e-9)


def test_meteor_fragmentation_penalty_orders():
    # same unigram overlap, different word order -> more chunks -> lower
    contiguous = meteor(["a b c d"], [["a b c d"]])
    shuffled = meteor(["c d a b"], [["a b c d"]])
    assert shuffled < contiguous
    # c d a b vs a b c d: runs (c d) and (a b) -> 2 chunks, m=4
    np.testing.assert_allclose(
        shuffled, 1.0 * (1 - 0.5 * (2 / 4) ** 3), atol=1e-9
    )


def test_meteor_align_reports_pairs_and_chunks():
    pairs, chunks = meteor_align(
        ["a", "b", "x"], ["a", "b", "y"], stages=("exact",)
    )
    assert pairs == [(0, 0), (1, 1)] and chunks == 1


def test_meteor_disjoint_zero():
    assert meteor(["xyz abc"], [["totally different words"]]) == 0.0


def test_mc_accuracy_regex():
    preds = ["(A)", "B) something", "The answer is (C).", "Zebra"]
    answers = ["(A)", "B)", "(C)", "(D)"]
    assert multiple_choice_accuracy(preds, answers) == 0.75
