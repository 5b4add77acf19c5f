"""Hand-computed COCO mAP cases pinning COCOeval-compatible semantics."""

import numpy as np
import pytest

from wedetect_tpu.eval.coco_map import CocoEvaluator, box_iou_xyxy


def gt(boxes, labels, iscrowd=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return {
        "boxes": boxes,
        "labels": np.asarray(labels, np.int64),
        "iscrowd": np.asarray(iscrowd if iscrowd is not None
                              else [False] * len(boxes), bool),
    }


def ev():
    return CocoEvaluator(class_ids=range(3))


def test_perfect():
    e = ev()
    boxes = [[0, 0, 50, 50], [60, 60, 120, 130]]
    e.add_image(gt(boxes, [0, 1]), np.array(boxes, float),
                np.array([0.9, 0.8]), np.array([0, 1]))
    s = e.summarize()
    assert s["mAP"] == pytest.approx(1.0)
    assert s["AP50"] == pytest.approx(1.0)


def test_half_recall():
    e = ev()
    e.add_image(gt([[0, 0, 50, 50], [60, 60, 110, 110]], [0, 0]),
                np.array([[0, 0, 50, 50]], float),
                np.array([0.9]), np.array([0]))
    s = e.summarize()
    # precision 1 up to recall 0.5 -> 51/101 interpolated points
    assert s["mAP"] == pytest.approx(51 / 101)


def test_fp_below_tp_harmless():
    e = ev()
    e.add_image(gt([[0, 0, 50, 50]], [0]),
                np.array([[0, 0, 50, 50], [200, 200, 250, 250]], float),
                np.array([0.9, 0.3]), np.array([0, 0]))
    assert e.summarize()["mAP"] == pytest.approx(1.0)


def test_fp_above_tp_halves_precision():
    e = ev()
    e.add_image(gt([[0, 0, 50, 50]], [0]),
                np.array([[200, 200, 250, 250], [0, 0, 50, 50]], float),
                np.array([0.9, 0.3]), np.array([0, 0]))
    assert e.summarize()["mAP"] == pytest.approx(0.5)


def test_iou_threshold_cut():
    # det overlaps gt with IoU exactly 0.6 -> TP at thr .5, .55, .6
    g = [[0, 0, 100, 100]]
    d = [[0, 0, 100, 60.0 / (2 - 0.6) / 100 * 100]]
    iou = box_iou_xyxy(np.array(d, float), np.array(g, float))[0, 0]
    # construct a det with IoU ~0.6: use area ratio a: iou = a/(1)
    d = [[0, 0, 100, 60]]  # inter 6000, union 10000 -> iou .6
    iou = box_iou_xyxy(np.array(d, float), np.array(g, float))[0, 0]
    assert iou == pytest.approx(0.6)
    e = ev()
    e.add_image(gt(g, [0]), np.array(d, float), np.array([0.9]),
                np.array([0]))
    assert e.summarize()["mAP"] == pytest.approx(3 / 10)


def test_crowd_not_fp():
    e = ev()
    # one real gt + one crowd region; det B falls on the crowd ->
    # ignored, not a false positive
    e.add_image(gt([[0, 0, 50, 50], [100, 100, 200, 200]], [0, 0],
                   iscrowd=[False, True]),
                np.array([[0, 0, 50, 50], [120, 120, 180, 180]], float),
                np.array([0.8, 0.9]), np.array([0, 0]))
    assert e.summarize()["mAP"] == pytest.approx(1.0)


def test_area_ranges():
    e = ev()
    # small gt (20x20=400 < 32^2) detected, large gt (200x200) missed
    e.add_image(gt([[0, 0, 20, 20], [300, 300, 500, 500]], [0, 0]),
                np.array([[0, 0, 20, 20]], float), np.array([0.9]),
                np.array([0]))
    s = e.summarize()
    assert s["APs"] == pytest.approx(1.0)
    assert s["APl"] == pytest.approx(0.0)
    assert s["mAP"] == pytest.approx(51 / 101)


def test_class_confusion_is_fp():
    e = ev()
    e.add_image(gt([[0, 0, 50, 50]], [0]),
                np.array([[0, 0, 50, 50]], float), np.array([0.9]),
                np.array([1]))
    assert e.summarize()["mAP"] == pytest.approx(0.0)


def test_multi_image_accumulation():
    e = ev()
    box = [[0, 0, 50, 50]]
    e.add_image(gt(box, [0]), np.array(box, float), np.array([0.9]),
                np.array([0]))
    e.add_image(gt(box, [0]), np.zeros((0, 4)), np.zeros(0),
                np.zeros(0, np.int64))
    # 1 of 2 gts detected across images
    assert e.summarize()["mAP"] == pytest.approx(51 / 101)


def test_native_matcher_parity():
    """C++ matcher == python loops on random cases."""
    from wedetect_tpu.native import coco_match, get_lib
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    from wedetect_tpu.eval.coco_map import IOU_THRS
    rng = np.random.default_rng(0)
    for _ in range(20):
        nd, ng = int(rng.integers(1, 30)), int(rng.integers(1, 12))
        iou = rng.uniform(0, 1, (nd, ng))
        gt_ig = rng.uniform(size=ng) < 0.3
        crowd = gt_ig & (rng.uniform(size=ng) < 0.5)
        got = coco_match(iou, gt_ig, crowd, IOU_THRS)
        dtm = np.full((len(IOU_THRS), nd), -1, np.int64)
        gtm = np.full((len(IOU_THRS), ng), -1, np.int64)
        for ti, thr in enumerate(IOU_THRS):
            for di in range(nd):
                best, bi = min(thr, 1 - 1e-10), -1
                for gi in range(ng):
                    if gtm[ti, gi] >= 0 and not crowd[gi]:
                        continue
                    if bi > -1 and not gt_ig[bi] and gt_ig[gi]:
                        break
                    if iou[di, gi] < best:
                        continue
                    best, bi = iou[di, gi], gi
                if bi == -1:
                    continue
                dtm[ti, di] = bi
                gtm[ti, bi] = di
        np.testing.assert_array_equal(got[0], dtm)
        np.testing.assert_array_equal(got[1], gtm)
