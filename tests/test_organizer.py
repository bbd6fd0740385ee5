import numpy as np
from PIL import Image

from rga3_tpu.data.visual_prompts.organizer import (
    sample_shape_colors, shape_phrase, substitute_region_markers,
    vip_processor,
)


def test_shape_phrase_forms():
    assert shape_phrase("red", "rectangle") == "within the red rectangle"
    assert shape_phrase(None, "arrow") == "pointed to by the arrow"
    assert shape_phrase("blue", "mask", False) == "the blue mask"


def test_sample_shape_colors_unique():
    out = sample_shape_colors(5, ["rectangle"], random_rgb_prob=0.0)
    rgbs = [rgb for _, rgb, _ in out]
    assert len(set(rgbs)) == len(rgbs)


def test_substitute_markers():
    convs = [
        {"from": "human", "value": "What is <region1> doing near <region2>?"},
        {"from": "gpt", "value": "It sits."},
    ]
    sc = [("red", (255, 0, 0), "rectangle"), ("blue", (0, 0, 255), "ellipse")]
    out = substitute_region_markers(convs, sc)
    assert "the red rectangle" in out[0]["value"]
    assert "the blue ellipse" in out[0]["value"]
    assert "<region" not in out[0]["value"]


def test_vip_processor_overlays_and_templates():
    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    )
    source = {
        "id": "osprey-stage2-0001",
        "bboxes": [[10, 10, 60, 50], [70, 40, 120, 90]],
        "segmentations": None,
        "conversations": [
            {"from": "human", "value": "Describe <region1> and <region2>."},
            {"from": "gpt", "value": "A and B."},
        ],
    }
    before = np.asarray(img).copy()
    out_img, conv = vip_processor(source, img)
    assert not np.array_equal(np.asarray(out_img), before)
    assert "<region" not in conv[0]["value"]
