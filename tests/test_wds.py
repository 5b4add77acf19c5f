"""Streaming tar dataset tests (synthetic shards)."""

import io
import json
import tarfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from wedetect_tpu.data.wds import NegQueue, WdsDetDataset  # noqa: E402


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("wds")
    rng = np.random.default_rng(0)
    for s in range(2):
        with tarfile.open(root / f"shard-{s}.tar", "w") as tf:
            for i in range(5):
                key = f"{s}_{i:04d}"
                img = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
                ok, enc = cv2.imencode(".jpg", img)
                assert ok
                ann = {
                    "meta": {"image_name": f"{key}.jpg"},
                    "annotations": [
                        {"bbox": [5, 5, 20, 20], "text_ch": "狗"},
                        {"bbox": [1, 2, 10, 12], "text_ch": "cat"},
                    ],
                }
                if i == 3:  # a broken sample: no annotations
                    ann["annotations"] = []
                for ext, data in (("jpg", enc.tobytes()),
                                  ("json",
                                   json.dumps(ann).encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
    return str(root / "shard-*.tar")


def test_stream_and_retry(shards):
    ds = WdsDetDataset(shards, en_zh_map={"cat": "猫"}, length=10)
    seen = 0
    for _ in range(8):
        s = ds.next_sample()
        assert s["image"].shape == (40, 50, 3)
        assert len(s["gt_bboxes"]) == 2
        assert s["texts"] == ["狗", "猫"]
        np.testing.assert_allclose(s["gt_bboxes"][0], [5, 5, 25, 25])
        seen += 1
    assert seen == 8  # broken samples skipped via retry


def test_node_split(shards):
    d0 = WdsDetDataset(shards, rank=0, world_size=2)
    d1 = WdsDetDataset(shards, rank=1, world_size=2)
    assert d0.paths != d1.paths
    assert len(d0.paths) == len(d1.paths) == 1


def test_neg_queue():
    q = NegQueue(size=4)
    q.update([["a"], ["b"], ["object"]])
    out = q.enrich([["c"]])
    # all pooled negatives appended (no cap); "object" dropped
    assert [t[0] for t in out] == ["c", "a", "b"]
    # pool itself downsamples to size
    q.update([["d"], ["e"], ["f"], ["g"]])
    assert len(q.queue) <= 4
    # string-list form works too
    q2 = NegQueue(size=4)
    q2.update(["x", "y"])
    assert q2.enrich(["y", "z"]) == ["y", "z", "x"]
