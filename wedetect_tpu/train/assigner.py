"""Batch Task-Aligned Assigner (TOOD TAL), fully batched & static-shape.

Behavioral spec: reference
wedetect/models/assigner/batch_task_aligned_assigner.py:160-456 and
assigner/utils.py:10-110, with use_ciou=True, topk=10, alpha=0.5,
beta=6.0 (config/wedetect_base.py:27-29, 98-106):

1. alignment metric = score[gt_label]^alpha * clamp(CIoU, 0)^beta
2. candidate mask = prior center strictly inside gt
3. per-gt top-k candidates by metric (invalid gts masked out)
4. anchors claimed by >1 gt -> the gt with max CIoU wins
5. targets: one-hot scores scaled by the per-gt normalized metric

TPU design notes: everything is one fused static-shape program over
(B, G, A) tensors (G = padded max-gt). The reference's
`F.one_hot(topk_idxs, A).sum(-2)` materializes (B, G, topk, A); here the
top-k mask is built with a vmapped scatter-add over (B*G, topk) indices
— O(B*G*topk) updates instead of O(B*G*topk*A) memory. The whole
assigner runs under stop_gradient (reference wraps it in no_grad).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from wedetect_tpu.ops.boxes import bbox_overlaps_aligned


class AssignResult(NamedTuple):
    labels: jax.Array    # (B, A) int32, num_classes for background
    bboxes: jax.Array    # (B, A, 4) assigned gt boxes (image units)
    scores: jax.Array    # (B, A, K) soft target scores
    fg_mask: jax.Array   # (B, A) bool
    # assigned gt index per anchor — the extra output of
    # YOLOWorldSegAssigner (reference task_aligned_assigner.py:15-114,
    # identical to the box assigner otherwise; lets seg losses gather
    # per-gt masks)
    gt_idx: jax.Array    # (B, A) int32


def _topk_mask(metrics: jax.Array, topk: int, valid: jax.Array
               ) -> jax.Array:
    """(B, G, A) metrics -> (B, G, A) {0,1} top-k mask.

    Matches select_topk_candidates: invalid gts' topk indices are
    forced to 0; anchors hit more than once are zeroed (which also
    kills the spurious index-0 hits of invalid gts when topk > 1).
    """
    b, g, a = metrics.shape
    _, idx = jax.lax.top_k(metrics, topk)            # (B, G, topk)
    idx = jnp.where(valid[..., None], idx, 0)

    def scatter_count(ix):
        return jnp.zeros((a,), jnp.int32).at[ix].add(1)

    counts = jax.vmap(jax.vmap(scatter_count))(idx)  # (B, G, A)
    return jnp.where(counts > 1, 0, counts).astype(metrics.dtype)


def assign(pred_bboxes: jax.Array, pred_scores: jax.Array,
           priors_xy: jax.Array, gt_labels: jax.Array,
           gt_bboxes: jax.Array, gt_mask: jax.Array,
           num_classes: int, topk: int = 10, alpha: float = 0.5,
           beta: float = 6.0, eps: float = 1e-9) -> AssignResult:
    """pred_bboxes (B,A,4) decoded xyxy; pred_scores (B,A,K) sigmoid;
    priors_xy (A,2); gt_labels (B,G) int; gt_bboxes (B,G,4) xyxy;
    gt_mask (B,G) bool (True = real gt).
    """
    pred_bboxes = jax.lax.stop_gradient(pred_bboxes.astype(jnp.float32))
    pred_scores = jax.lax.stop_gradient(pred_scores.astype(jnp.float32))
    b, a, k = pred_scores.shape
    g = gt_bboxes.shape[1]
    gtm = gt_mask.astype(jnp.float32)

    # --- alignment metric -------------------------------------------------
    # score of each anchor for each gt's class: (B, G, A)
    bbox_scores = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1),
        jnp.clip(gt_labels, 0, k - 1)[:, :, None], axis=1)
    # CIoU(pred (B,1,A,4), gt (B,G,1,4)) -> (B, G, A), clamped at 0
    overlaps = jnp.clip(bbox_overlaps_aligned(
        pred_bboxes[:, None, :, :], gt_bboxes[:, :, None, :],
        iou_mode="ciou"), 0.0)
    alignment = (bbox_scores ** alpha) * (overlaps ** beta)

    # --- in-gt + top-k masks ---------------------------------------------
    px, py = priors_xy[:, 0], priors_xy[:, 1]
    inside = ((px[None, None, :] - gt_bboxes[..., 0:1] > eps)
              & (py[None, None, :] - gt_bboxes[..., 1:2] > eps)
              & (gt_bboxes[..., 2:3] - px[None, None, :] > eps)
              & (gt_bboxes[..., 3:4] - py[None, None, :] > eps)
              ).astype(jnp.float32)
    topk_m = _topk_mask(alignment * inside, topk, gt_mask)
    pos_mask = topk_m * inside * gtm[..., None]       # (B, G, A)

    # --- resolve multi-gt anchors by max overlap --------------------------
    fg_counts = pos_mask.sum(axis=-2)                 # (B, A)
    multi = fg_counts[:, None, :] > 1
    best_gt = jnp.argmax(overlaps, axis=1)            # (B, A)
    is_max = jax.nn.one_hot(best_gt, g, axis=1,
                            dtype=pos_mask.dtype)     # (B, G, A)
    pos_mask = jnp.where(multi, is_max, pos_mask)
    fg_mask = pos_mask.sum(axis=-2) > 0               # (B, A)
    assigned_gt = jnp.argmax(pos_mask, axis=-2)       # (B, A)

    # --- gather targets ---------------------------------------------------
    labels = jnp.take_along_axis(jnp.maximum(gt_labels, 0), assigned_gt,
                                 axis=1)
    bboxes = jnp.take_along_axis(gt_bboxes, assigned_gt[..., None],
                                 axis=1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    onehot = jnp.where(fg_mask[..., None], onehot, 0.0)

    # --- per-gt metric normalization -------------------------------------
    align_pos = alignment * pos_mask
    pos_align_max = align_pos.max(axis=-1, keepdims=True)      # (B, G, 1)
    pos_overlap_max = (overlaps * pos_mask).max(axis=-1,
                                                keepdims=True)  # (B, G, 1)
    norm = (align_pos * pos_overlap_max
            / (pos_align_max + eps)).max(axis=-2)[..., None]    # (B, A, 1)
    scores = onehot * norm

    return AssignResult(labels=labels.astype(jnp.int32), bboxes=bboxes,
                        scores=scores, fg_mask=fg_mask,
                        gt_idx=assigned_gt.astype(jnp.int32))
