"""LVIS evaluator protocol tests."""

import numpy as np
import pytest

from wedetect_tpu.eval.lvis_map import LvisEvaluator

BOX = [0, 0, 50, 50]
FAR = [200, 200, 250, 250]


def gt(boxes, labels):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return {"boxes": boxes, "labels": np.asarray(labels, np.int64),
            "iscrowd": np.zeros(len(boxes), bool)}


def test_domain_exclusion():
    """A detection of a category neither annotated nor negative on the
    image is excluded — no FP, unlike COCO."""
    e = LvisEvaluator(class_ids=range(3))
    # image has gt of class 0 only; detection of class 1 excluded
    e.add_image(gt([BOX], [0]),
                np.array([BOX, FAR], float), np.array([0.9, 0.8]),
                np.array([0, 1]), neg_cats=set())
    s = e.summarize()
    assert s["mAP"] == pytest.approx(1.0)

    # same but class 1 is a verified negative -> FP counted; add a
    # second image where class 1 has a (detected) gt so its AP is
    # defined, then the neg-image FP drags it below 1
    e2 = LvisEvaluator(class_ids=range(3))
    e2.add_image(gt([BOX], [0]),
                 np.array([BOX, FAR], float), np.array([0.9, 0.8]),
                 np.array([0, 1]), neg_cats={1})
    e2.add_image(gt([BOX], [1]),
                 np.array([BOX], float), np.array([0.7]),
                 np.array([1]))
    assert e2.summarize()["mAP"] < 1.0

    # control: without the negative flag the image-1 class-1 det is
    # excluded and both classes stay perfect
    e3 = LvisEvaluator(class_ids=range(3))
    e3.add_image(gt([BOX], [0]),
                 np.array([BOX, FAR], float), np.array([0.9, 0.8]),
                 np.array([0, 1]))
    e3.add_image(gt([BOX], [1]),
                 np.array([BOX], float), np.array([0.7]),
                 np.array([1]))
    assert e3.summarize()["mAP"] == pytest.approx(1.0)


def test_not_exhaustive_ignores_unmatched():
    e = LvisEvaluator(class_ids=range(2))
    # class 0 not exhaustively annotated: extra higher-scored det is
    # ignored, not a false positive
    e.add_image(gt([BOX], [0]),
                np.array([BOX, FAR], float), np.array([0.8, 0.9]),
                np.array([0, 0]), not_exhaustive={0})
    assert e.summarize()["mAP"] == pytest.approx(1.0)

    e2 = LvisEvaluator(class_ids=range(2))
    e2.add_image(gt([BOX], [0]),
                 np.array([BOX, FAR], float), np.array([0.8, 0.9]),
                 np.array([0, 0]))
    assert e2.summarize()["mAP"] < 1.0


def test_per_class_cap():
    e = LvisEvaluator(class_ids=range(1), per_class_cap=1)
    # two images; the lower-scored (correct) det gets cut by the cap
    e.add_image(gt([BOX], [0]), np.array([FAR], float),
                np.array([0.9]), np.array([0]), neg_cats=set())
    e.add_image(gt([FAR], [0]), np.array([FAR], float),
                np.array([0.5]), np.array([0]))
    s = e.summarize()
    assert s["mAP"] == pytest.approx(0.0)  # only the 0.9 FP survives


def test_frequency_groups():
    e = LvisEvaluator(class_ids=range(2),
                      frequencies={0: "r", 1: "f"})
    e.add_image(gt([BOX], [0]), np.array([BOX], float),
                np.array([0.9]), np.array([0]))
    e.add_image(gt([BOX], [1]), np.array([FAR], float),
                np.array([0.9]), np.array([1]))
    s = e.summarize()
    assert s["APr"] == pytest.approx(1.0)
    assert s["APf"] == pytest.approx(0.0)
