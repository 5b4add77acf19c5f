"""Tests for gRefCOCO and HumanRef metrics."""

import numpy as np
import pytest

from wedetect_tpu.eval.grounding_metrics import (grefcoco_metrics,
                                                 humanref_density_f1)

BOX = [0, 0, 10, 10]
BOX2 = [50, 50, 70, 80]


def test_grefcoco_perfect():
    m = grefcoco_metrics([
        {"pred_boxes": [BOX, BOX2], "gt_boxes": [BOX, BOX2]},
        {"pred_boxes": [], "gt_boxes": [], "no_target": True},
    ])
    assert m["F1_score"] == 1.0
    assert m["T_acc"] == 1.0
    assert m["N_acc"] == 1.0


def test_grefcoco_no_target_fail():
    m = grefcoco_metrics([
        {"pred_boxes": [BOX], "gt_boxes": [], "no_target": True}])
    assert m["N_acc"] == 0.0
    assert m["F1_score"] == 0.0


def test_grefcoco_partial():
    # one of two gts found -> f1 = 2/3 < 1.0 -> not counted
    m = grefcoco_metrics([
        {"pred_boxes": [BOX], "gt_boxes": [BOX, BOX2]}])
    assert m["F1_score"] == 0.0
    assert m["T_acc"] == 1.0


def test_humanref():
    m = humanref_density_f1([
        {"pred_boxes": [BOX, BOX2], "gt_boxes": [BOX, BOX2],
         "total_persons": 4},
        {"pred_boxes": [], "gt_boxes": [], "rejection": True},
    ])
    assert m["precision"] == 1.0
    assert m["recall"] == 1.0
    assert m["density_f1"] == 1.0
    assert m["rejection_acc"] == 1.0


def test_humanref_density_penalty():
    # 1 gt, 2 preds (one matching): precision .5, recall 1,
    # std f1 = 2/3; density penalty = min(1, (1/4)/(2/4)) = .5
    m = humanref_density_f1([
        {"pred_boxes": [BOX, [100, 100, 120, 120]],
         "gt_boxes": [BOX], "total_persons": 4}])
    assert m["recall"] == 1.0
    assert m["precision"] == 0.5
    assert m["density_f1"] == pytest.approx(2 / 3 * 0.5)


def test_humanref_rejection_fail():
    m = humanref_density_f1([
        {"pred_boxes": [BOX], "gt_boxes": [], "rejection": True}])
    assert m["rejection_acc"] == 0.0
    assert m["density_f1"] == 0.0
