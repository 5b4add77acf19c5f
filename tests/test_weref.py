"""WeRefDataset: VLM tags, sam boxes, fallback."""

import json

import numpy as np
import pytest

from wedetect_tpu.data.weref import WeRefDataset


class FakeBase:
    def __init__(self):
        self.n = 3

    def __len__(self):
        return self.n

    def sample(self, i):
        return {"image": np.zeros((10, 10, 3), np.uint8),
                "gt_bboxes": np.array([[0, 0, 5, 5]], np.float32),
                "gt_labels": np.array([0]),
                "texts": ["base"],
                "img_path": f"img{i}.jpg", "idx": i}


@pytest.fixture
def ref_root(tmp_path):
    lines = [
        {"key": "img0", "annotations": [
            {"bbox": [1, 1, 4, 4], "sam2_bbox": [2, 2, 4, 4],
             "vlm": {"tags": ["thing", "红色的狗"]}},
            {"bbox": [0, 0, 3, 3], "sam2_bbox": [0, 0, 3, 3],
             "vlm": "ERROR"},
        ]},
        {"key": "img1", "annotations": [
            {"bbox": [1, 1, 2, 2], "sam2_bbox": [1, 1, 2, 2],
             "vlm": {"tags": []}},  # bad: no tags
        ]},
    ]
    p = tmp_path / "refs.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))
    return str(tmp_path)


def test_weref(ref_root):
    ds = WeRefDataset(FakeBase(), ref_root, mixed_ratio=1.0, seed=0)
    s = ds.sample(0)
    # sam boxes used, xywh->xyxy; last tag is the class
    np.testing.assert_allclose(s["gt_bboxes"][0], [2, 2, 6, 6])
    assert s["texts"][0] == "红色的狗"
    assert s["texts"][1] == "object"  # ERROR vlm fallback tag
    # img1 has no tags -> falls back to a successful sample
    s1 = ds.sample(1)
    assert 1 in ds.error_ids
    assert s1["texts"][0] == "红色的狗"
    # img2 missing from ref infos -> fallback too
    ds.sample(2)
    assert 2 in ds.error_ids


def test_weref_mixed_zero(ref_root):
    ds = WeRefDataset(FakeBase(), ref_root, mixed_ratio=0.0, seed=0)
    s = ds.sample(0)
    assert s["texts"] == ["base"]
