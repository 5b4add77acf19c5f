"""Static-shape multi-label top-k + class-aware greedy NMS.

Replaces the reference's dynamic `filter_scores_and_topk` +
torchvision `batched_nms` pipeline (reference:
generate_proposal.py:87-133, 1203-1210;
wedetect/models/dense_heads/yolo_world_head.py:712-749) with a
fixed-shape XLA program:

1. multi-label expansion: scores (A, K) -> A*K candidates
   (anchor a, class k); candidates with score <= score_thr are masked.
2. `lax.top_k` keeps nms_pre candidates.
3. greedy class-aware NMS as `max_out` iterations of
   (argmax over alive) -> (suppress same-class IoU > thr), which is
   exactly equivalent to sorted greedy NMS: the t-th argmax pick equals
   the t-th kept box of the sorted sweep.

Everything is padded: outputs are fixed (max_out,) slots with a
validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NMSResult(NamedTuple):
    boxes: jax.Array    # (B, max_out, 4)
    scores: jax.Array   # (B, max_out)
    labels: jax.Array   # (B, max_out) int32
    anchors: jax.Array  # (B, max_out) int32 — source anchor index
    valid: jax.Array    # (B, max_out) bool


def _pairwise_iou_1_to_n(box: jax.Array, boxes: jax.Array) -> jax.Array:
    """IoU of one (4,) box against (N, 4) boxes -> (N,)."""
    lt = jnp.maximum(box[0:2], boxes[:, 0:2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    area1 = jnp.clip(box[2] - box[0], 0) * jnp.clip(box[3] - box[1], 0)
    area2 = (jnp.clip(boxes[:, 2] - boxes[:, 0], 0)
             * jnp.clip(boxes[:, 3] - boxes[:, 1], 0))
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _greedy_nms(boxes, scores, labels, anchors, iou_thr, max_out):
    """Single-image greedy NMS over pre-sorted/masked candidates.

    boxes (N, 4), scores (N,) with masked-out candidates at -inf,
    labels/anchors (N,) int32. Returns fixed (max_out,) slots.
    """
    n = scores.shape[0]
    neg_inf = jnp.float32(-jnp.inf)

    def body(i, carry):
        s, ob, os_, ol, oa = carry
        best = jnp.argmax(s)
        bscore = s[best]
        bbox = boxes[best]
        blabel = labels[best]
        keep_valid = bscore > neg_inf

        ob = ob.at[i].set(jnp.where(keep_valid, bbox, 0.0))
        os_ = os_.at[i].set(jnp.where(keep_valid, bscore, neg_inf))
        ol = ol.at[i].set(jnp.where(keep_valid, blabel, -1))
        oa = oa.at[i].set(jnp.where(keep_valid, anchors[best], -1))

        iou = _pairwise_iou_1_to_n(bbox, boxes)
        suppress = (iou > iou_thr) & (labels == blabel)
        suppress = suppress | (jnp.arange(n) == best)
        s = jnp.where(suppress & keep_valid, neg_inf, s)
        # if nothing valid remains, keep s unchanged (all -inf anyway)
        return s, ob, os_, ol, oa

    init = (
        scores,
        jnp.zeros((max_out, 4), boxes.dtype),
        jnp.full((max_out,), neg_inf, jnp.float32),
        jnp.full((max_out,), -1, jnp.int32),
        jnp.full((max_out,), -1, jnp.int32),
    )
    _, ob, os_, ol, oa = jax.lax.fori_loop(0, max_out, body, init)
    valid = os_ > neg_inf
    os_ = jnp.where(valid, os_, 0.0)
    return ob, os_, ol, oa, valid


def static_nms_single(scores_ak: jax.Array, boxes_a: jax.Array,
                      score_thr: float, nms_pre: int, iou_thr: float,
                      max_out: int, class_mask: jax.Array | None = None,
                      multi_label: bool = True):
    """Single-image pipeline: (A, K) scores + (A, 4) boxes -> NMS slots.

    class_mask: optional (K,) bool — False lanes (padding classes when K
    is bucketed) are excluded.
    """
    a, k = scores_ak.shape
    scores_ak = scores_ak.astype(jnp.float32)
    if class_mask is not None:
        scores_ak = jnp.where(class_mask[None, :], scores_ak, -jnp.inf)

    if multi_label and k > 1:
        flat = scores_ak.reshape(a * k)
        flat = jnp.where(flat > score_thr, flat, -jnp.inf)
        nms_pre = min(nms_pre, a * k)
        top_scores, top_idx = jax.lax.top_k(flat, nms_pre)
        anchor_idx = top_idx // k
        label_idx = (top_idx % k).astype(jnp.int32)
    else:
        best_scores = jnp.max(scores_ak, axis=-1)
        best_labels = jnp.argmax(scores_ak, axis=-1).astype(jnp.int32)
        best_scores = jnp.where(best_scores > score_thr, best_scores,
                                -jnp.inf)
        nms_pre = min(nms_pre, a)
        top_scores, anchor_idx = jax.lax.top_k(best_scores, nms_pre)
        label_idx = best_labels[anchor_idx]

    cand_boxes = boxes_a[anchor_idx].astype(jnp.float32)
    return _greedy_nms(cand_boxes, top_scores, label_idx,
                       anchor_idx.astype(jnp.int32), iou_thr, max_out)


def batched_static_nms(scores: jax.Array, boxes: jax.Array,
                       score_thr: float = 0.001, nms_pre: int = 30000,
                       iou_thr: float = 0.7, max_out: int = 300,
                       class_mask: jax.Array | None = None,
                       multi_label: bool = True) -> NMSResult:
    """Batched static NMS.

    scores: (B, A, K) post-sigmoid; boxes: (B, A, 4) xyxy.
    """
    fn = lambda s, b: static_nms_single(  # noqa: E731
        s, b, score_thr, nms_pre, iou_thr, max_out,
        class_mask=class_mask, multi_label=multi_label)
    ob, os_, ol, oa, valid = jax.vmap(fn)(scores, boxes)
    return NMSResult(ob, os_, ol, oa, valid)
