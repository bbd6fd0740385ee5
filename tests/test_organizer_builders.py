"""Byte-match parity of the region-QA conversation builders against the
reference `utils/visual_prompt_organizer.py`.

The reference module is loaded with its generator import satisfied by this
repo's constants (COLOR_POOL/WORDS_SHAPE are already parity-checked), so
both implementations draw from the same `random` stream; seeded
identically, every generated conversation must match byte-for-byte.
"""
import random
import types

import pytest

from rga3_tpu.data import visual_prompts as vp
from rga3_tpu.data.templates import WORDS_SHAPE
from rga3_tpu.data.visual_prompts import builders as B
from rga3_tpu.data.visual_prompts.generator import COLOR_POOL

REF_PATH = "/root/reference/utils/visual_prompt_organizer.py"
COLOR_LIST = list(COLOR_POOL.items())


@pytest.fixture(scope="module")
def ref():
    try:
        with open(REF_PATH) as f:
            src = f.read()
    except OSError:
        pytest.skip("reference tree not available")
    src = src.replace(
        "from .visual_prompt_generator import "
        "image_blending, color_pool, words_shape",
        "",
    )
    mod = types.ModuleType("ref_organizer")
    mod.color_pool = COLOR_POOL
    mod.words_shape = WORDS_SHAPE
    mod.image_blending = None  # builders never rasterize
    exec(compile(src, REF_PATH, "exec"), mod.__dict__)
    return mod


def both(seed, f_ref, f_mine):
    random.seed(seed)
    r = f_ref()
    random.seed(seed)
    m = f_mine()
    return r, m


def test_build_prompt(ref):
    q = "What is the object doing?"
    opts = ["running", "sitting", "flying", "swimming"]
    assert B.build_prompt(q, opts) == ref.build_prompt(q, opts)
    assert B.build_prompt(q, opts[:3]) == ref.build_prompt(q, opts[:3])


def test_add_period_and_autocorrect(ref):
    for s in [
        "a man , with a hat",
        "she said e.g. this",
        "already done.",
        "why not ?",
        "mr. smith goes ,to town",
    ]:
        assert (
            B.add_period_and_autocorrect(s)
            == ref.add_period_and_autocorrect(s)
        )


def test_get_answer_parity(ref):
    for seed in range(25):
        for choice in range(4):
            r, m = both(
                seed,
                lambda: ref.get_answer(choice, "The dog is running.", True),
                lambda: B.get_answer(choice, "The dog is running.", True),
            )
            assert r == m
    assert B.get_answer(1, "text", False) == "text"


def test_get_color_shape_parity(ref):
    pool = ["rectangle", "ellipse", "arrow"]
    for seed in range(25):
        r, m = both(
            seed,
            lambda: ref.get_color_shape([0, 1, 2, 3], pool, COLOR_LIST),
            lambda: B.get_color_shape([0, 1, 2, 3], pool, COLOR_LIST),
        )
        assert r == m


def test_get_all_qa_parity(ref):
    corpus = [["Why is", [0], "chasing", [1, 2], "?"],
              ["Because", [1], "ran", "."]]
    sci = {
        0: ["red", (255, 0, 0), "rectangle"],
        1: [None, (1, 2, 3), "arrow"],
        2: ["blue", (0, 0, 255), "mask"],
    }
    names = ["dog", "cat", "ball"]
    for seed in range(25):
        for at in ("", "direct"):
            r, m = both(
                seed,
                lambda: ref.get_all_qa(corpus, sci, names, answer_type=at),
                lambda: B.get_all_qa(corpus, sci, names, answer_type=at),
            )
            assert r[0] == m[0] and r[1] == m[1]


VCR_LINE = {
    "question": ["Why is", [0], "looking at", [1], "?"],
    "answer_choices": [
        [[0], "is hungry", "."],
        ["Because", [1], "is shiny", "."],
        ["no reason", "."],
        [[1], "called", [0], "."],
    ],
    "answer_label": 1,
    "rationale_choices": [
        [[0], "stares", "."],
        ["it glows", "."],
        [[1], "is new", "."],
        ["habit", "."],
    ],
    "rationale_label": 2,
    "class_names": ["person", "car"],
}
VCR_POOL = ["rectangle", "ellipse", "triangle", "scribble",
            "mask contour", "mask", "arrow"]


def _copy_line():
    import copy

    return copy.deepcopy(VCR_LINE)


def test_vcr_direct_qa_parity(ref):
    for seed in range(15):
        r, m = both(
            seed,
            lambda: ref.create_question_direct_qa(
                _copy_line(), VCR_POOL, COLOR_LIST
            ),
            lambda: B.create_question_direct_qa(
                _copy_line(), VCR_POOL, COLOR_LIST
            ),
        )
        assert r == m


def test_vcr_direct_qar_parity(ref):
    for seed in range(15):
        r, m = both(
            seed,
            lambda: ref.create_question_direct_qar(
                _copy_line(), VCR_POOL, COLOR_LIST
            ),
            lambda: B.create_question_direct_qar(
                _copy_line(), VCR_POOL, COLOR_LIST
            ),
        )
        assert r == m


def test_vcr_two_turn_parity(ref):
    for seed in range(25):
        r, m = both(
            seed,
            lambda: ref.create_question_prompt(
                _copy_line(), VCR_POOL, COLOR_LIST
            ),
            lambda: B.create_question_prompt(
                _copy_line(), VCR_POOL, COLOR_LIST
            ),
        )
        assert r == m


def test_flickr30k_parity(ref):
    line = {
        "bbox": [[[10, 10, 50, 50]], [[60, 20, 90, 80], [5, 5, 20, 20]]],
        "grounding": "A man <bbox0> holds a kite <bbox1> on the beach",
    }
    pool = ["rectangle", "ellipse", "arrow"]
    for seed in range(30):
        import copy

        r, m = both(
            seed,
            lambda: ref.create_question_prompt_flicker30k(
                copy.deepcopy(line), pool, COLOR_LIST
            ),
            lambda: B.create_question_prompt_flicker30k(
                copy.deepcopy(line), pool, COLOR_LIST
            ),
        )
        assert r == m


def test_v7w_parity(ref):
    line = {
        "question": "Which region shows the dog?",
        "bboxes": [[0, 0, 10, 10], [5, 5, 20, 20], [1, 1, 4, 4],
                   [8, 8, 30, 30]],
        "answer": [5, 5, 20, 20],
    }
    for seed in range(15):
        import copy

        r, m = both(
            seed,
            lambda: ref.create_question_prompt_direct(
                copy.deepcopy(line), ["rectangle"], COLOR_LIST,
                answer_type="direct",
            ),
            lambda: B.create_question_prompt_direct(
                copy.deepcopy(line), ["rectangle"], COLOR_LIST,
                answer_type="direct",
            ),
        )
        assert r == m


def test_pointqa_parity(ref):
    line = {"general_question": "How many dogs?", "answer": "two"}
    r, m = both(
        3,
        lambda: ref.create_question_prompt_direct_pointQA(dict(line)),
        lambda: B.create_question_prompt_direct_pointQA(dict(line)),
    )
    assert r == m


def test_vip_conv_generator_parity(ref):
    shapes2 = [["red", (255, 0, 0), "rectangle"],
               [None, (3, 4, 5), "ellipse"]]

    def src_refcocog():
        return {"answer": "a brown dog", "conversations": [
            {"from": "human", "value": "Describe <bbox>."},
            {"from": "gpt", "value": "A dog."},
        ]}

    def src_vgrel():
        return {"answer": "(man, rides, horse)", "conversations": [
            {"from": "human", "value": "Relate <bbox0> and <bbox1>."},
            {"from": "gpt", "value": "(man, rides, horse)"},
        ]}

    def src_osprey():
        return {"conversations": [
            {"from": "human", "value": "What is <region1> next to <region2>?"},
            {"from": "gpt", "value": "A tree."},
        ]}

    for seed in range(15):
        for dt, sub, src in [
            ("refcocog", "", src_refcocog),
            ("refcocog", "gpt4v", src_refcocog),
            ("vg_rel", "", src_vgrel),
            ("vg_rel", "gpt4v", src_vgrel),
            ("osprey", "conv", src_osprey),
        ]:
            r, m = both(
                seed,
                lambda: ref.vip_conv_generator(
                    src(), [list(s) for s in shapes2], dt, sub_type=sub
                ),
                lambda: B.vip_conv_generator(
                    src(), [list(s) for s in shapes2], dt, sub_type=sub
                ),
            )
            assert r == m


def test_vip_processor_unknown_type_raises():
    import numpy as np
    from PIL import Image

    img = Image.fromarray(np.zeros((32, 32, 3), dtype=np.uint8))
    with pytest.raises(KeyError):
        vp.organizer.vip_processor(
            {"id": "nosuch-x-1", "bboxes": [[1, 1, 10, 10]]}, img
        )


def test_vip_processor_vcr_end_to_end():
    """VCR rows build conversations from raw fields and rasterize the
    referenced instances (synthetic meta, no reference needed)."""
    import copy

    import numpy as np
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(
            0, 255, (96, 128, 3), dtype=np.uint8
        )
    )
    source = copy.deepcopy(VCR_LINE)
    source["id"] = "vcr-train-0"
    source["meta"] = {
        "boxes": [[10, 10, 60, 50, 0.9], [70, 40, 120, 90, 0.8]],
        "segms": [[[[10, 10], [60, 10], [60, 50], [10, 50]]], [[]]],
    }
    random.seed(0)
    before = np.asarray(img).copy()
    out_img, conv = vp.organizer.vip_processor(source, img)
    assert len(conv) == 4 and conv[0]["from"] == "human"
    assert "<image>" in conv[0]["value"]
    assert not np.array_equal(np.asarray(out_img), before)
