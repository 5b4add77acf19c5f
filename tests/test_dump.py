"""Raw-prediction dump round trip (reference DumpDetResults,
test.py:29,143): metrics recomputed from the dump must equal the live
run's bit-for-bit, and the npz layout must invert exactly."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_detector import mini_cfg  # noqa: E402
from test_eval_pipeline import coco_dir  # noqa: E402,F401
from wedetect_tpu.data.coco import CocoDetDataset  # noqa: E402
from wedetect_tpu.eval.dump import (load_detections,  # noqa: E402
                                    recompute_metrics, save_detections)
from wedetect_tpu.eval.runner import evaluate_coco  # noqa: E402
from wedetect_tpu.models.wedetect import init_variables  # noqa: E402


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    records = []
    for i in range(4):
        n = int(rng.integers(0, 5))
        records.append({
            "img_id": 100 + i,
            "boxes": rng.uniform(0, 64, (n, 4)).astype(np.float32),
            "scores": rng.uniform(0, 1, (n,)).astype(np.float32),
            "labels": rng.integers(0, 3, (n,)).astype(np.int64),
            "embeds": rng.standard_normal((n, 8)).astype(np.float16),
        })
    path = str(tmp_path / "dets.npz")
    save_detections(path, records)
    back = load_detections(path)
    assert len(back) == 4
    for a, b in zip(records, back):
        assert b["img_id"] == a["img_id"]
        np.testing.assert_array_equal(b["boxes"], a["boxes"])
        np.testing.assert_array_equal(b["scores"], a["scores"])
        np.testing.assert_array_equal(b["labels"], a["labels"])
        np.testing.assert_array_equal(b["embeds"], a["embeds"])


def test_empty_dump(tmp_path):
    path = str(tmp_path / "empty.npz")
    save_detections(path, [])
    assert load_detections(path) == []


def test_metrics_recompute_identical(coco_dir, tmp_path):  # noqa: F811
    ds = CocoDetDataset(str(coco_dir / "ann.json"), str(coco_dir))
    cfg = mini_cfg(num_classes=2)
    variables = init_variables(cfg, seed=0)
    w = np.random.default_rng(1).standard_normal(
        (2, cfg.embed_dims)).astype(np.float32)
    path = str(tmp_path / "dets.npz")
    live = evaluate_coco(cfg, variables, ds, w, batch_size=2,
                         dump_path=path)
    redo = recompute_metrics(ds, path)
    assert set(live) == set(redo)
    for k in live:
        if k == "per_class":
            continue
        assert live[k] == redo[k] or (
            np.isnan(live[k]) and np.isnan(redo[k])), k
    # the dump carries real embeddings at full detection width
    recs = load_detections(path)
    assert len(recs) == len(ds)
    assert all(r["embeds"].shape[1] == cfg.embed_dims for r in recs
               if len(r["scores"]))
