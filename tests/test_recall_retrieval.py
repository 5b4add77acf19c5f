"""Tests for proposal recall and retrieval metrics."""

import numpy as np
import pytest

from wedetect_tpu.eval.recall import (_greedy_gt_ious, eval_recalls,
                                      summarize_recalls)
from wedetect_tpu.eval.retrieval import retrieval_metrics, score_image


def test_recall_perfect():
    gts = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)]
    props = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)]
    r = eval_recalls(gts, props, proposal_nums=(100, 300))
    assert r.shape == (2, 10)
    np.testing.assert_allclose(r, 1.0)
    s = summarize_recalls(r)
    assert s["AR@100"] == pytest.approx(1.0)


def test_recall_budget_cut():
    # correct proposal ranked 3rd: found at N=3, missed at N=2
    gts = [np.array([[0, 0, 10, 10]], float)]
    props = [np.array([
        [50, 50, 60, 60, 0.9],
        [70, 70, 80, 80, 0.8],
        [0, 0, 10, 10, 0.7],
    ])]
    r = eval_recalls(gts, props, proposal_nums=(2, 3))
    np.testing.assert_allclose(r[0], 0.0)
    np.testing.assert_allclose(r[1], 1.0)


def test_recall_partial_iou():
    # proposal IoU 0.5 with gt -> counts for thr .5 only
    gts = [np.array([[0, 0, 10, 10]], float)]
    props = [np.array([[0, 0, 10, 5]], float)]  # iou = 50/100 = .5
    r = eval_recalls(gts, props, proposal_nums=(100,))
    assert r[0, 0] == 1.0 and r[0, 1] == 0.0
    assert summarize_recalls(r, (100,))["AR@100"] == pytest.approx(0.1)


def test_greedy_matching_one_to_one():
    # one proposal overlapping both gts can only cover one
    ious = np.array([[0.9, 0.0], [0.8, 0.0]], np.float32)
    got = _greedy_gt_ious(ious)
    assert got[0] == pytest.approx(0.9)
    assert got[1] == pytest.approx(0.0)


def test_score_image_and_retrieval():
    emb = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    texts = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]], np.float32)
    scale = np.log(np.array([2.0, 2.0], np.float32))
    bias = np.zeros(2, np.float32)
    probs = score_image(emb, texts, scale, bias)
    assert probs[0] == pytest.approx(1 / (1 + np.exp(-2.0)))
    assert probs[2] <= 0.5  # best proposal is orthogonal -> sigmoid(0)

    results = retrieval_metrics(
        [{"image_id": 1, "embeddings": emb, "scale": scale,
          "bias": bias},
         {"image_id": 2, "embeddings": -emb, "scale": scale,
          "bias": bias}],
        texts, ["a", "b", "c"],
        {"a": {1}, "b": {1, 2}, "c": {2}}, thr=0.5)
    assert results["a"]["precision"] == 1.0
    assert results["a"]["recall"] == 1.0
    assert results["b"]["recall"] == 0.5  # only img1 scores class b
    assert results["c"]["recall"] == 1.0  # -emb matches -e0 direction
    assert "macro" in results
