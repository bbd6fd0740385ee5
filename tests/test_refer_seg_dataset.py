"""ReferSegDataset over REFER (refcoco) and G_REFER (grefcoco) fixtures
(ref utils/refer_seg_dataset.py:55-110)."""
import json
import pickle

import numpy as np
import pytest
from PIL import Image

from rga3_tpu.data.datasets.image_seg import ReferSegDataset


@pytest.fixture()
def refer_root(tmp_path):
    rng = np.random.default_rng(0)
    rs = tmp_path / "refer_seg"
    img_dir = rs / "images" / "mscoco" / "images" / "train2014"
    img_dir.mkdir(parents=True)
    Image.fromarray(
        rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    ).save(img_dir / "img.jpg")

    instances = {
        "images": [{"id": 1, "file_name": "img.jpg", "height": 40,
                    "width": 60}],
        "annotations": [
            {"id": 11, "image_id": 1, "category_id": 1,
             "segmentation": [[5, 5, 30, 5, 30, 25, 5, 25]]},
            {"id": 12, "image_id": 1, "category_id": 1,
             "segmentation": [[35, 10, 55, 10, 55, 30, 35, 30]]},
        ],
        "categories": [{"id": 1, "name": "thing"}],
    }

    # refcoco: pickled refs
    rc = rs / "refcoco"
    rc.mkdir()
    with open(rc / "instances.json", "w") as f:
        json.dump(instances, f)
    refs = [{
        "ref_id": 0, "ann_id": 11, "image_id": 1, "split": "train",
        "sentences": [{"sent": "the left box"}], "category_id": 1,
    }]
    with open(rc / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)

    # grefcoco: json refs with a multi-target and a no-target expression
    gc = rs / "grefcoco"
    gc.mkdir()
    with open(gc / "instances.json", "w") as f:
        json.dump(instances, f)
    grefs = [
        {"ref_id": 0, "ann_id": [11, 12], "image_id": 1, "split": "train",
         "sentences": [{"sent": "both boxes"}]},
        {"ref_id": 1, "ann_id": -1, "image_id": 1, "split": "train",
         "sentences": [{"sent": "the dragon"}]},
    ]
    with open(gc / "grefs(unc).json", "w") as f:
        json.dump(grefs, f)
    return str(tmp_path)


def test_refcoco_sampling(refer_root):
    ds = ReferSegDataset(refer_root, datasets="refcoco")
    assert len(ds) == 1
    s = ds.sample()
    assert s.has_masks
    assert "left box" in s.messages[0].content[-1]["text"]
    assert float(s.gt_masks.max()) == 1.0


def test_grefcoco_multi_target_union(refer_root):
    ds = ReferSegDataset(refer_root, datasets="grefcoco")
    assert len(ds) == 2
    # force the multi-target ref: union covers both boxes
    dsname, api, _ = ds.refs[0]
    assert dsname == "grefcoco"
    mask = api.get_mask(api.loadRefs(0)[0])
    assert mask[10, 10] == 1 and mask[20, 45] == 1
    # no-target ref: empty mask
    assert api.get_mask(api.loadRefs(1)[0]).sum() == 0


def test_mixed_sources(refer_root):
    ds = ReferSegDataset(refer_root, datasets="refcoco||grefcoco")
    assert len(ds) == 3
    for _ in range(4):
        s = ds.sample()
        assert s.gt_masks.shape[0] == 4
