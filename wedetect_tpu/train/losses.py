"""Detection losses: BCE cls, CIoU box, Distribution Focal Loss.

Behavioral spec: reference
wedetect/models/dense_heads/yolov8_head.py loss_by_feat (used via
yolo_world_head.py:436-576) with the config weights
loss_cls=0.5 (sigmoid BCE, reduction none -> sum / assigned_sum),
loss_bbox=7.5 (CIoU, reduction sum, weighted by per-anchor assigned
score sum, / assigned_sum), loss_dfl=1.5/4 (DFL on stride-normalized
ltrb targets, weighted, avg by assigned_sum)
(config/wedetect_base.py:82-97; mmdet DistributionFocalLoss semantics:
CE to floor/ceil bins weighted by linear interpolation).

Static-shape: positives are handled by masking, not gathering — every
anchor contributes a (possibly zero-weighted) term, so the graph is
fixed regardless of the number of positives.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from wedetect_tpu.configs import ModelCfg
from wedetect_tpu.ops.boxes import bbox2distance, bbox_overlaps_aligned


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise sigmoid BCE (matches F.binary_cross_entropy_with_logits)."""
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def dfl_loss(dist_logits: jax.Array, target: jax.Array) -> jax.Array:
    """Distribution Focal Loss per element.

    dist_logits: (..., reg_max) logits; target: (...) continuous in
    [0, reg_max-1]. CE to the two adjacent bins with linear weights.
    """
    tl = jnp.floor(target)
    tr = tl + 1.0
    wl = tr - target
    wr = target - tl
    logp = jax.nn.log_softmax(dist_logits, axis=-1)
    reg_max = dist_logits.shape[-1]
    ce_l = -jnp.take_along_axis(
        logp, jnp.clip(tl, 0, reg_max - 1).astype(jnp.int32)[..., None],
        axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(
        logp, jnp.clip(tr, 0, reg_max - 1).astype(jnp.int32)[..., None],
        axis=-1)[..., 0]
    return ce_l * wl + ce_r * wr


class DetLosses(NamedTuple):
    total: jax.Array
    cls: jax.Array
    bbox: jax.Array
    dfl: jax.Array
    num_pos: jax.Array


def detection_loss(cfg: ModelCfg,
                   cls_logits: jax.Array,      # (B, A, K)
                   pred_bboxes: jax.Array,     # (B, A, 4) image units
                   dist_logits: jax.Array,     # (B, A, 4, reg_max)
                   assigned_bboxes: jax.Array,  # (B, A, 4)
                   assigned_scores: jax.Array,  # (B, A, K)
                   fg_mask: jax.Array,          # (B, A) bool
                   priors_xy: jax.Array,        # (A, 2)
                   strides: jax.Array,          # (A,)
                   loss_scale: float = 1.0) -> DetLosses:
    """Combined loss. `loss_scale` replicates the reference's
    `num_imgs * world_size` factor (yolo_world_head.py:570-576); under
    a pjit global batch use loss_scale=global_batch with summed grads.
    """
    t = cfg.train
    f32 = jnp.float32
    cls_logits = cls_logits.astype(f32)
    assigned_sum = jnp.maximum(assigned_scores.sum(), 1.0)
    fg = fg_mask.astype(f32)

    loss_cls = bce_with_logits(cls_logits, assigned_scores).sum()
    loss_cls = loss_cls / assigned_sum * t.loss_cls_weight

    s = strides[None, :, None]
    pb = pred_bboxes.astype(f32) / s
    ab = assigned_bboxes.astype(f32) / s
    bbox_weight = (assigned_scores.sum(-1) * fg)  # (B, A)
    ciou = bbox_overlaps_aligned(pb, ab, iou_mode="ciou")
    loss_bbox = ((1.0 - ciou) * bbox_weight).sum()
    loss_bbox = loss_bbox / assigned_sum * t.loss_bbox_weight

    target_ltrb = bbox2distance(priors_xy[None] / s, ab,
                                max_dis=cfg.reg_max - 1, eps=0.01)
    ldfl = dfl_loss(dist_logits.astype(f32), target_ltrb)  # (B, A, 4)
    loss_dfl = (ldfl * bbox_weight[..., None]).sum()
    loss_dfl = loss_dfl / assigned_sum * t.loss_dfl_weight

    total = (loss_cls + loss_bbox + loss_dfl) * loss_scale
    return DetLosses(total=total, cls=loss_cls, bbox=loss_bbox,
                     dfl=loss_dfl, num_pos=fg.sum())


def cov_mse_loss(pred: jax.Array, dim: int = 0,
                 eps: float = 1e-6) -> jax.Array:
    """Coefficient-of-variation MSE against zero.

    Behavioral spec: reference wedetect/models/losses/dynamic_loss.py
    :12-38 (CoVMSELoss, registered but unused by shipped configs):
    cov = std/clip(mean, eps) along `dim`; loss = mean(cov^2).
    Uses the torch-default unbiased (ddof=1) std.
    """
    pred = pred.astype(jnp.float32)
    n = pred.shape[dim]
    mean = pred.mean(axis=dim)
    var = jnp.sum(jnp.square(pred - jnp.expand_dims(mean, dim)),
                  axis=dim) / jnp.maximum(n - 1, 1)
    cov = jnp.sqrt(var) / jnp.maximum(mean, eps)
    return jnp.mean(jnp.square(cov))
