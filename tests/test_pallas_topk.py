"""Pallas row-top-T kernel + the batched NMS fast path (exactness)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import wedetect_tpu.ops.nms as nms_mod
from wedetect_tpu.ops.nms import batched_static_nms, static_nms_single
from wedetect_tpu.ops.pallas_topk import row_topk


def test_row_topk_matches_numpy():
    rng = np.random.default_rng(0)
    r, k, t = 48, 96, 8
    x = rng.standard_normal((r, k)).astype(np.float32)
    x[3] = -np.inf                      # fully masked row
    x[5, 10:] = -np.inf
    vals, cls = row_topk(jnp.asarray(x), t, row_block=16,
                         interpret=True)
    vals, cls = np.asarray(vals), np.asarray(cls)
    for i in range(r):
        order = np.argsort(-x[i], kind="stable")[:t]
        np.testing.assert_allclose(vals[i], x[i][order])
        finite = np.isfinite(x[i][order])
        np.testing.assert_array_equal(cls[i][finite], order[finite])


def test_row_topk_tie_order_ascending_class():
    x = np.full((8, 32), 0.25, np.float32)
    x[:, 7] = 0.5
    vals, cls = row_topk(jnp.asarray(x), 4, row_block=8,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(cls)[0], [7, 0, 1, 2])
    np.testing.assert_allclose(np.asarray(vals)[0],
                               [0.5, 0.25, 0.25, 0.25])


def _make_case(rng, b, a, k):
    scores = rng.uniform(0, 1, (b, a, k)).astype(np.float32)
    boxes = rng.uniform(0, 200, (b, a, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 60, (b, a, 2))
    return jnp.asarray(scores), jnp.asarray(boxes)


def _run_both(scores, boxes, monkeypatch, nms_pre=64, max_out=16):
    """Run the batched fast path and the per-image exact path."""
    monkeypatch.setattr(nms_mod, "TOPK_THRESHOLD_MIN_N", 1)
    fast = batched_static_nms(scores, boxes, score_thr=0.3,
                              nms_pre=nms_pre, iou_thr=0.6,
                              max_out=max_out)
    # reference: the per-image selection path (force big-N branch off)
    monkeypatch.setattr(nms_mod, "TOPK_THRESHOLD_MIN_N", 1 << 60)
    ref = batched_static_nms(scores, boxes, score_thr=0.3,
                             nms_pre=nms_pre, iou_thr=0.6,
                             max_out=max_out)
    return fast, ref


def test_batched_fast_path_matches_exact(monkeypatch):
    rng = np.random.default_rng(1)
    scores, boxes = _make_case(rng, 2, 240, 16)
    fast, ref = _run_both(scores, boxes, monkeypatch)
    np.testing.assert_array_equal(np.asarray(fast.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(fast.anchors),
                                  np.asarray(ref.anchors))
    np.testing.assert_array_equal(np.asarray(fast.labels),
                                  np.asarray(ref.labels))
    np.testing.assert_allclose(np.asarray(fast.boxes),
                               np.asarray(ref.boxes))


def test_batched_fast_path_guard_fallback(monkeypatch):
    """One anchor holding > T of the global top-k trips the guard and
    the cond falls back to the exact bisection path."""
    rng = np.random.default_rng(2)
    b, a, k = 1, 240, 80
    scores = rng.uniform(0, 0.4, (b, a, k)).astype(np.float32)
    scores[0, 7, :] = rng.uniform(0.9, 1.0, k)  # 80 > T=64 in anchor 7
    boxes = rng.uniform(0, 200, (b, a, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 60, (b, a, 2))

    fast, ref = _run_both(jnp.asarray(scores), jnp.asarray(boxes),
                          monkeypatch, nms_pre=128, max_out=32)
    np.testing.assert_array_equal(np.asarray(fast.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(fast.anchors),
                                  np.asarray(ref.anchors))
    np.testing.assert_allclose(np.asarray(fast.scores),
                               np.asarray(ref.scores))


def test_batched_fast_path_with_class_mask(monkeypatch):
    rng = np.random.default_rng(3)
    scores, boxes = _make_case(rng, 1, 240, 16)
    mask = np.ones(16, bool)
    mask[10:] = False
    monkeypatch.setattr(nms_mod, "TOPK_THRESHOLD_MIN_N", 1)
    fast = batched_static_nms(scores, boxes, score_thr=0.3,
                              nms_pre=64, iou_thr=0.6, max_out=16,
                              class_mask=jnp.asarray(mask))
    labels = np.asarray(fast.labels)[np.asarray(fast.valid)]
    assert labels.size and (labels < 10).all()
