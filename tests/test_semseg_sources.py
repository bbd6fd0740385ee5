"""SemSegDataset 5-source union (ref utils/sem_seg_dataset.py:19-124):
ADE20K / COCO-Stuff / Mapillary label PNGs + PACO-LVIS / Pascal-Part COCO
jsons through the pure-python CocoIndex."""
import json

import numpy as np
import pytest
from PIL import Image

from rga3_tpu.data.datasets.image_seg import SemSegDataset


@pytest.fixture()
def semseg_root(tmp_path):
    rng = np.random.default_rng(0)

    def save_img(path, h=40, w=50):
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(path)

    def save_label(path, value, h=40, w=50, background=0):
        path.parent.mkdir(parents=True, exist_ok=True)
        lab = np.full((h, w), background, np.uint8)
        lab[10:30, 10:40] = value
        Image.fromarray(lab).save(path)

    # ade20k: label value 3 => class index 2 after the shift
    ade = tmp_path / "ade20k"
    ade.mkdir()
    with open(ade / "ade20k_classes.json", "w") as f:
        json.dump(["wall", "building", "sky"], f)
    save_img(ade / "images" / "training" / "a.jpg")
    save_label(ade / "annotations" / "training" / "a.png", 3)

    # cocostuff: classes file + train2017 label; "-" classes ignored
    cs = tmp_path / "cocostuff"
    cs.mkdir()
    with open(cs / "cocostuff_classes.txt", "w") as f:
        f.write("header\n0: person\n1: grass-merged\n2: tree\n")
    save_label(cs / "train2017" / "b.png", 2, background=255)
    save_img(tmp_path / "coco" / "train2017" / "b.jpg")

    # mapillary
    mp = tmp_path / "mapillary"
    mp.mkdir()
    with open(mp / "config_v2.0.json", "w") as f:
        json.dump({"labels": [{"readable": "Road"}, {"readable": "Car"}]}, f)
    save_label(mp / "training" / "v2.0" / "labels" / "c.png", 1,
               background=255)
    save_img(mp / "training" / "images" / "c.jpg")

    # paco_lvis: COCO json with polygon segmentation; image under coco/
    paco_dir = tmp_path / "vlpart" / "paco" / "annotations"
    paco_dir.mkdir(parents=True)
    save_img(tmp_path / "coco" / "p.jpg")
    with open(paco_dir / "paco_lvis_v1_train.json", "w") as f:
        json.dump({
            "categories": [
                {"id": 1, "name": "car_(vehicle):wheel"},
                {"id": 2, "name": "dog"},
            ],
            "images": [
                {"id": 10, "file_name": "p.jpg", "height": 40, "width": 50}
            ],
            "annotations": [{
                "id": 100, "image_id": 10, "category_id": 1,
                "segmentation": [[5, 5, 45, 5, 45, 35, 5, 35]],
            }],
        }, f)

    # pascal_part: images under VOCdevkit
    pp_dir = tmp_path / "vlpart" / "pascal_part"
    pp_dir.mkdir(parents=True)
    save_img(
        pp_dir / "VOCdevkit" / "VOC2010" / "JPEGImages" / "v.jpg"
    )
    with open(pp_dir / "train.json", "w") as f:
        json.dump({
            "categories": [{"id": 1, "name": "dog:head"}],
            "images": [
                {"id": 20, "file_name": "v.jpg", "height": 40, "width": 50}
            ],
            "annotations": [{
                "id": 200, "image_id": 20, "category_id": 1,
                "segmentation": [[8, 8, 30, 8, 30, 30, 8, 30]],
            }],
        }, f)
    return str(tmp_path)


def test_all_five_sources_discovered(semseg_root):
    ds = SemSegDataset(semseg_root)
    assert sorted(ds.sources) == [
        "ade20k", "cocostuff", "mapillary", "paco_lvis", "pascal_part"
    ]
    assert len(ds) == 5


@pytest.mark.parametrize(
    "source", ["ade20k", "cocostuff", "mapillary", "paco_lvis",
               "pascal_part"]
)
def test_each_source_samples(semseg_root, source):
    ds = SemSegDataset(semseg_root, sem_seg_data=source)
    assert ds.sources == [source]
    s = ds.sample()
    assert s.has_masks
    assert s.gt_masks.shape[0] == 4  # num_frames_sam pseudo-video
    assert float(s.gt_masks.max()) == 1.0  # the selected class is present
    # the question names a class from the right source
    text = s.messages[0].content[-1]["text"].lower()
    expected = {
        "ade20k": "sky",       # label 3 -> shifted index 2
        "cocostuff": "tree",   # "grass-merged" is ignored
        "mapillary": "car",    # readable name, lowered
        "paco_lvis": "wheel",  # part phrase includes the part word
        "pascal_part": "head",
    }[source]
    assert expected in text


def test_cocostuff_merged_classes_ignored(semseg_root):
    ds = SemSegDataset(semseg_root, sem_seg_data="cocostuff")
    for _ in range(5):
        s = ds.sample()
        assert "grass" not in s.messages[0].content[-1]["text"].lower()
