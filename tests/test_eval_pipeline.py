"""End-to-end eval pipeline: synthetic COCO dataset -> loader ->
detect graph -> evaluator."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_detector import mini_cfg  # noqa: E402
from wedetect_tpu.data.coco import CocoDetDataset, first_texts  # noqa: E402
from wedetect_tpu.data.loader import EvalLoader  # noqa: E402
from wedetect_tpu.eval.runner import evaluate_coco, process_shard  # noqa: E402
from wedetect_tpu.models.wedetect import init_variables  # noqa: E402


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("minicoco")
    rng = np.random.default_rng(0)
    images, annotations = [], []
    aid = 1
    for i in range(5):
        h, w = int(rng.integers(60, 120)), int(rng.integers(60, 120))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        x, y = int(rng.integers(0, w // 2)), int(rng.integers(0, h // 2))
        bw, bh = int(rng.integers(10, w - x)), int(rng.integers(10, h - y))
        img[y:y + bh, x:x + bw] = (255, 0, 0)
        path = root / f"img{i}.png"
        cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        images.append({"id": i + 1, "file_name": f"img{i}.png",
                       "width": w, "height": h})
        annotations.append({
            "id": aid, "image_id": i + 1, "category_id": 7,
            "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
        aid += 1
    ann = {
        "images": images, "annotations": annotations,
        "categories": [{"id": 7, "name": "redbox"},
                       {"id": 12, "name": "other"}],
    }
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    texts = root / "texts.json"
    texts.write_text(json.dumps([["红盒子", "redbox"], ["其他"]]))
    return root


def test_dataset_parsing(coco_dir):
    ds = CocoDetDataset(str(coco_dir / "ann.json"), str(coco_dir),
                        class_text_path=str(coco_dir / "texts.json"))
    assert len(ds) == 5
    assert ds.class_names == ["redbox", "other"]
    assert first_texts(ds.texts) == ["红盒子", "其他"]
    g = ds.gt_arrays(0)
    assert g["boxes"].shape == (1, 4)
    assert g["labels"][0] == 0  # cat id 7 -> label 0
    t = ds.train_arrays(0, max_gt=8)
    assert t["gt_bboxes"].shape == (8, 4)
    assert t["gt_mask"].sum() == 1


def test_loader_batches(coco_dir):
    ds = CocoDetDataset(str(coco_dir / "ann.json"), str(coco_dir))
    loader = EvalLoader(ds, (64, 64), batch_size=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["images"].shape == (2, 64, 64, 3)
    assert batches[-1]["n_valid"] == 1
    assert batches[-1]["images"].shape == (2, 64, 64, 3)


def test_process_shard():
    assert list(process_shard(10, 0, 4)) == [0, 1, 2]
    assert list(process_shard(10, 3, 4)) == [9]
    assert sum(len(list(process_shard(10, r, 4))) for r in range(4)) == 10


def test_evaluate_random_weights(coco_dir):
    ds = CocoDetDataset(str(coco_dir / "ann.json"), str(coco_dir))
    cfg = mini_cfg(num_classes=2)
    variables = init_variables(cfg, seed=0)
    w = np.random.default_rng(1).standard_normal(
        (2, cfg.embed_dims)).astype(np.float32)
    metrics = evaluate_coco(cfg, variables, ds, w, batch_size=2)
    assert set(metrics) == {"mAP", "AP50", "AP75", "APs", "APm",
                            "APl", "per_class"}
    assert 0.0 <= metrics["mAP"] <= 1.0 or np.isnan(metrics["mAP"])

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
