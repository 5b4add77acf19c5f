"""Grounding eval suite: dataset builders, merge modes, metrics.

Synthetic fixtures exercise every benchmark driver end-to-end (the
datasets themselves aren't in this environment); merge-mode goldens
are hand-computed against the reference algorithm
(wedetect_ref/eval_grounding/eval.py:1585-1625).
"""

import json
import pickle

import numpy as np
import pytest

from wedetect_tpu.eval.merge import (batched_nms_numpy,
                                     merge_predictions, nms_numpy)


# ----------------------------------------------------------- merge


def test_merge_multi_query_topk():
    props = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    scores = np.array([[0.9, 0.1], [0.5, 0.8]])
    boxes, labels, sc = merge_predictions(scores, props,
                                          num_select=3)
    # flattened candidates: (q0,p0)=.9 (q0,p1)=.1 (q1,p0)=.5 (q1,p1)=.8
    np.testing.assert_allclose(sc, [0.9, 0.8, 0.5])
    np.testing.assert_array_equal(labels, [0, 1, 1])
    np.testing.assert_allclose(boxes[0], props[0])
    np.testing.assert_allclose(boxes[1], props[1])


def test_merge_score_threshold():
    props = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    scores = np.array([[0.9, 0.1], [0.5, 0.8]])
    boxes, labels, sc = merge_predictions(scores, props,
                                          score_thre=0.6)
    np.testing.assert_allclose(sorted(sc, reverse=True), [0.9, 0.8])
    assert len(boxes) == 2


def test_merge_single_box():
    props = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    scores = np.array([[0.9, 0.1], [0.5, 0.8]])
    boxes, labels, sc = merge_predictions(scores, props,
                                          single_box=True)
    # per-proposal max over queries
    np.testing.assert_allclose(sc, [0.9, 0.8])
    np.testing.assert_array_equal(labels, [0, 1])
    np.testing.assert_allclose(boxes, props)


def test_merge_nms_class_aware():
    # two overlapping boxes, same label -> suppressed; different
    # labels -> kept
    props = np.array([[0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5]],
                     np.float64)  # IoU 0.82 > 0.7
    same = np.array([[0.9, 0.8]])
    boxes, labels, sc = merge_predictions(same, props, nms=True,
                                          num_select=10)
    assert len(boxes) == 1 and sc[0] == 0.9
    diff = np.array([[0.9, 0.0], [0.0, 0.8]])
    boxes, labels, sc = merge_predictions(diff, props, nms=True,
                                          score_thre=0.5)
    assert len(boxes) == 2  # different query labels survive


def test_merge_cap_1000():
    n = 600
    props = np.tile(np.array([[0, 0, 1, 1]], np.float64), (n, 1))
    props[:, 0] += np.arange(n) * 10  # disjoint
    scores = np.stack([np.linspace(1, 0.5, n),
                       np.linspace(0.49, 0.1, n)])
    boxes, labels, sc = merge_predictions(scores, props,
                                          num_select=2000)
    # 1200 candidates capped at 1000 before selection
    assert len(boxes) == 1000
    assert sc.min() >= np.sort(scores.reshape(-1))[-1000]


def test_nms_matches_greedy_oracle(rng):
    boxes = rng.uniform(0, 50, (40, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 20, (40, 2))],
                           axis=1)
    scores = rng.uniform(0, 1, 40)
    keep = nms_numpy(boxes, scores, 0.5)

    def oracle(boxes, scores, thr):
        idx = list(np.argsort(-scores, kind="mergesort"))
        out = []
        while idx:
            i = idx.pop(0)
            out.append(i)
            rest = []
            for j in idx:
                xx1 = max(boxes[i, 0], boxes[j, 0])
                yy1 = max(boxes[i, 1], boxes[j, 1])
                xx2 = min(boxes[i, 2], boxes[j, 2])
                yy2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
                a = ((boxes[i, 2] - boxes[i, 0])
                     * (boxes[i, 3] - boxes[i, 1]))
                b = ((boxes[j, 2] - boxes[j, 0])
                     * (boxes[j, 3] - boxes[j, 1]))
                if inter / max(a + b - inter, 1e-12) <= thr:
                    rest.append(j)
            idx = rest
        return out

    assert list(keep) == oracle(boxes, scores, 0.5)


# --------------------------------------------------------- builders


@pytest.fixture
def coco_json(tmp_path):
    data = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 100,
                    "height": 80},
                   {"id": 2, "file_name": "b.jpg", "width": 60,
                    "height": 60}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 7,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 11, "image_id": 1, "category_id": 9,
             "bbox": [5, 5, 10, 10], "area": 100, "iscrowd": 1},
            {"id": 12, "image_id": 2, "category_id": 9,
             "bbox": [0, 0, 30, 30], "area": 900, "iscrowd": 0},
        ],
        "categories": [{"id": 7, "name": "cat"},
                       {"id": 9, "name": "dog"}],
    }
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_build_coco(coco_json):
    from wedetect_tpu.eval.grounding_data import build_coco

    items = build_coco(coco_json, "/imgs")
    assert len(items) == 2
    assert items[0]["queries"] == ["cat", "dog"]
    assert items[0]["query_labels"] == [7, 9]
    # crowd annotation dropped from the item gts
    assert items[0]["gt_labels"] == [7]
    np.testing.assert_allclose(items[0]["gt_bboxes"],
                               [[10, 10, 30, 30]])


def test_build_refcoco(tmp_path):
    from wedetect_tpu.eval.grounding_data import build_refcoco

    data = [{"id": 5, "image": "x.jpg",
             "conversations": [{"value": "q"},
                               {"value": "red mug"}],
             "bounding_boxes": [[1, 2, 3, 4]]}]
    p = tmp_path / "refcoco_validation.json"
    p.write_text(json.dumps(data))
    items = build_refcoco([str(p)], "/imgs")
    assert items[0]["dataset"] == "refcoco_validation"
    assert items[0]["queries"] == ["red mug"]
    np.testing.assert_allclose(items[0]["gt_bboxes"], [[1, 2, 3, 4]])


def test_build_grefcoco(tmp_path):
    from wedetect_tpu.eval.grounding_data import build_grefcoco

    data = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 50,
                    "height": 50, "caption": "two dogs"},
                   {"id": 2, "file_name": "b.jpg", "width": 50,
                    "height": 50, "caption": "nothing"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 10, 10]},
            {"id": 2, "image_id": 2, "category_id": -1,
             "bbox": [0, 0, 0, 0]},
        ],
        "categories": [{"id": 1, "name": "x"}],
    }
    p = tmp_path / "g.json"
    p.write_text(json.dumps(data))
    items = build_grefcoco([str(p)], "/imgs", subsets=("val",))
    assert items[0]["no_target"] is False
    assert items[0]["queries"] == ["two dogs"]
    assert items[1]["no_target"] is True


def test_build_humanref(tmp_path):
    from wedetect_tpu.eval.grounding_data import build_humanref

    lines = [
        {"id": 1, "image_name": "h.jpg", "referring": "tall person",
         "answer_boxes": [[0, 0, 5, 5]],
         "candidate_boxes": [[0, 0, 5, 5], [6, 6, 9, 9]],
         "domain": "attribute"},
        {"id": 2, "image_name": "h2.jpg", "referring": "a unicorn",
         "answer_boxes": [], "candidate_boxes": [[1, 1, 2, 2]],
         "domain": "rejection"},
    ]
    p = tmp_path / "ann.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))
    items = build_humanref(str(p), "/imgs")
    assert items[0]["total_persons"] == 2
    assert items[0]["proposals"] == [[0, 0, 5, 5], [6, 6, 9, 9]]
    assert items[1]["rejection"] is True


@pytest.fixture
def d3_pkls(tmp_path):
    imgs = {1: {"id": 1, "file_name": "d3_0001.jpg"},
            2: {"id": 2, "file_name": "d3_0002.jpg"}}
    groups = {100: {"id": 100, "img_ids": [1], "sent_ids": [7, 8]},
              101: {"id": 101, "img_ids": [2], "sent_ids": [8]}}
    sents = {7: {"id": 7, "raw_sent": "a red fire hydrant"},
             8: {"id": 8, "raw_sent": "dog lying on the warm sandy "
                                      "beach next to the sea"}}
    annos = {50: {"id": 50, "image_id": 1, "bbox": [0, 0, 10, 10],
                  "sent_ids": [7]}}
    for name, obj in [("d3_imgs.pkl", imgs), ("d3_groups.pkl", groups),
                      ("d3_sents.pkl", sents), ("d3_annos.pkl", annos)]:
        with open(tmp_path / name, "wb") as f:
            pickle.dump(obj, f)
    return str(tmp_path)


def test_d3_reader_and_builder(d3_pkls):
    from wedetect_tpu.data.d3 import D3
    from wedetect_tpu.eval.grounding_data import build_d3

    d3 = D3("/imgs", d3_pkls)
    assert d3.get_img_ids() == [1, 2]
    assert d3.get_group_ids(img_ids=[1]) == [100]
    assert [s["raw_sent"] for s in
            d3.load_sents(d3.get_sent_ids(group_ids=[100]))][0] \
        == "a red fire hydrant"

    items = build_d3("/imgs", d3_pkls)
    assert len(items) == 2
    assert items[0]["queries"] == ["a red fire hydrant",
                                   "dog lying on the warm sandy beach "
                                   "next to the sea"]
    assert items[0]["query_labels"] == [7, 8]
    assert items[1]["query_labels"] == [8]


# ---------------------------------------------------------- metrics


def _args(**kw):
    import argparse
    ns = argparse.Namespace(ann=[], img_root="", proposals="",
                            pkl_root="", odinw_spec="", num_select=300,
                            num_proposals=100, nms=False,
                            score_thre=-1.0, single_box=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_run_metrics_refcoco():
    from wedetect_tpu.cli.eval_grounding import run_metrics

    results = [
        {"id": 1, "dataset": "refcoco_validation",
         "boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([0]),
         "scores": np.array([0.9]), "gt_bboxes": [[0, 0, 10, 10]]},
        {"id": 2, "dataset": "refcoco_validation",
         "boxes": np.array([[50, 50, 60, 60]]),
         "labels": np.array([0]), "scores": np.array([0.9]),
         "gt_bboxes": [[0, 0, 10, 10]]},
    ]
    out = run_metrics("refcoco", results, _args())
    assert out["refcoco_validation"]["acc@1"] == 0.5


def test_run_metrics_coco_perfect(coco_json):
    from wedetect_tpu.cli.eval_grounding import run_metrics

    results = [
        {"id": 1, "dataset": "coco",
         "boxes": np.array([[10, 10, 30, 30]]),
         "labels": np.array([7]), "scores": np.array([0.9])},
        {"id": 2, "dataset": "coco",
         "boxes": np.array([[0, 0, 30, 30]]),
         "labels": np.array([9]), "scores": np.array([0.8])},
    ]
    out = run_metrics("coco", results, _args(ann=[coco_json]))
    assert out["coco"]["mAP"] == pytest.approx(1.0)


def test_run_metrics_grefcoco(tmp_path):
    from wedetect_tpu.cli.eval_grounding import run_metrics

    results = [
        {"id": 1, "dataset": "val",
         "boxes": np.array([[0, 0, 10, 10]]),
         "gt_bboxes": [[0, 0, 10, 10]], "no_target": False},
        {"id": 2, "dataset": "val", "boxes": np.zeros((0, 4)),
         "gt_bboxes": [], "no_target": True},
    ]
    out = run_metrics("grefcoco", results, _args(ann=["x"]))
    assert out["val"]["F1_score"] == 1.0
    assert out["val"]["N_acc"] == 1.0 and out["val"]["T_acc"] == 1.0


def test_run_metrics_humanref():
    from wedetect_tpu.cli.eval_grounding import run_metrics

    results = [
        {"id": 1, "dataset": "humanref",
         "boxes": np.array([[0, 0, 5, 5]]),
         "gt_bboxes": [[0, 0, 5, 5]], "rejection": False,
         "total_persons": 2},
        {"id": 2, "dataset": "humanref", "boxes": np.zeros((0, 4)),
         "gt_bboxes": [], "rejection": True, "total_persons": 1},
    ]
    out = run_metrics("humanref", results, _args())
    assert out["humanref"]["density_f1"] == 1.0
    assert out["humanref"]["rejection_acc"] == 1.0


def test_run_metrics_d3(tmp_path, d3_pkls):
    """d3 ann jsons use sentence ids as category ids; perfect
    predictions give mAP 1 and populate the length breakdown."""
    from wedetect_tpu.cli.eval_grounding import run_metrics

    ann = {
        "images": [{"id": 1, "file_name": "d3_0001.jpg", "width": 100,
                    "height": 100},
                   {"id": 2, "file_name": "d3_0002.jpg", "width": 100,
                    "height": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 8,
             "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0},
        ],
        "categories": [
            {"id": 7, "name": "a red fire hydrant"},
            {"id": 8, "name": "dog lying on the warm sandy beach "
                              "next to the sea"}],
    }
    p = tmp_path / "d3_full.json"
    p.write_text(json.dumps(ann))
    results = [
        {"id": 1, "dataset": "d3",
         "boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([7]),
         "scores": np.array([0.9])},
        {"id": 2, "dataset": "d3",
         "boxes": np.array([[5, 5, 25, 25]]), "labels": np.array([8]),
         "scores": np.array([0.8])},
    ]
    out = run_metrics("d3", results, _args(ann=[str(p)]))
    m = out["FULL"]
    assert m["mAP"] == pytest.approx(1.0)
    # "a red fire hydrant" = 4 words -> mid;  10-word sent -> very_long
    assert m["mAP_mid"] == pytest.approx(1.0)
    assert m["mAP_very_long"] == pytest.approx(1.0)
    assert np.isnan(m["mAP_short"])


def test_batched_nms_label_offsets():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float64)
    scores = np.array([0.9, 0.8])
    # same label -> one survives; different labels -> both
    assert len(batched_nms_numpy(boxes, scores,
                                 np.array([0, 0]), 0.5)) == 1
    assert len(batched_nms_numpy(boxes, scores,
                                 np.array([0, 1]), 0.5)) == 2


def test_score_items_rec_batch_branch(tmp_path):
    """score_items uses score_rec for single-query shards with a
    bucketed scorer, and the per-item path otherwise — identical
    results either way."""
    import cv2

    from wedetect_tpu.cli.eval_grounding import score_items

    root = tmp_path
    rng = np.random.default_rng(0)
    items = []
    for i in range(3):
        name = f"im{i}.jpg"
        cv2.imwrite(str(root / name),
                    rng.integers(0, 255, (40, 50, 3), np.uint8))
        items.append({"id": i, "dataset": "refcoco", "image": name,
                      "img_root": str(root), "queries": [f"thing {i}"],
                      "query_labels": [0],
                      "proposals": [[1, 1, 20, 20], [5, 5, 40, 30]]})

    class StubScorer:
        prefix_sharing = True
        grid_buckets = ((32, 32),)
        query_batch = 2
        calls = []

        def _scores(self, img, props, q):
            r = np.random.default_rng(len(q) + int(img.sum()) % 97)
            return r.uniform(0.01, 0.99, len(props))

        def score(self, img, props, queries, pad_token_id=0):
            self.calls.append("score")
            return np.stack([self._scores(img, props, q)
                             for q in queries])

        def score_rec(self, samples, pad_token_id=0):
            self.calls.append("score_rec")
            return [self._scores(im, pr, q) for im, pr, q in samples]

    class A:
        num_proposals = 100
        single_box = True
        nms = False
        score_thre = -1.0
        num_select = 5

    s = StubScorer()
    batched = score_items(items, s, {}, A())
    assert "score_rec" in s.calls and "score" not in s.calls

    s2 = StubScorer()
    s2.grid_buckets = None        # disables the rec-batch branch
    s2.calls = []
    per_item = score_items(items, s2, {}, A())
    assert "score" in s2.calls
    for a, b in zip(batched, per_item):
        np.testing.assert_allclose(a["boxes"], b["boxes"])
        np.testing.assert_allclose(a["scores"], b["scores"])
