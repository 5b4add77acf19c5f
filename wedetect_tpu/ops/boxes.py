"""Box coding and IoU family, all shape-polymorphic and jit-safe.

Covers the reference's box math:
- distance2bbox / bbox2distance (reference: generate_proposal.py:1003-1049,
  wedetect/models/task_modules/coders/distance_point_bbox_coder.py:13-79)
- aligned bbox_overlaps with iou/ciou/giou/siou modes
  (reference: wedetect/models/losses/iou_loss.py:13-180)
- plain pairwise IoU used by NMS and the TAL assigner
  (reference: wedetect/models/assigner/utils.py:83-110).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def distance2bbox(points: jax.Array, distance: jax.Array) -> jax.Array:
    """Decode (l, t, r, b) distances at `points` into xyxy boxes.

    points: (..., 2), distance: (..., 4) -> (..., 4).
    """
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points: jax.Array, bbox: jax.Array,
                  max_dis: float | None = None,
                  eps: float = 0.01) -> jax.Array:
    """Encode xyxy boxes into clamped (l, t, r, b) distances.

    Matches WeDetectDistancePointBBoxCoder.encode: clamp to
    [0, max_dis - eps] (reference:
    task_modules/coders/distance_point_bbox_coder.py:57-79).
    """
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    d = jnp.stack([left, top, right, bottom], axis=-1)
    if max_dis is not None:
        d = jnp.clip(d, 0.0, max_dis - eps)
    return d


def bbox_overlaps_aligned(pred: jax.Array, target: jax.Array,
                          iou_mode: str = "ciou",
                          siou_theta: float = 4.0,
                          eps: float = 1e-7) -> jax.Array:
    """Elementwise (broadcasting) IoU/CIoU/GIoU/SIoU between xyxy boxes.

    pred/target: (..., 4) -> (...). Matches
    wedetect/models/losses/iou_loss.py:13-180 (incl. the YOLOv5-style
    CIoU alpha with stop-gradient, and the final clamp to [-1, 1]).
    """
    b1x1, b1y1, b1x2, b1y2 = (pred[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (target[..., i] for i in range(4))

    overlap = (jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
               * jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + w2 * h2 - overlap + eps
    # note: reference redefines h1/h2 with +eps after computing union
    h1e, h2e = h1 + eps, h2 + eps
    ious = overlap / union

    enc_x1 = jnp.minimum(b1x1, b2x1)
    enc_y1 = jnp.minimum(b1y1, b2y1)
    enc_x2 = jnp.maximum(b1x2, b2x2)
    enc_y2 = jnp.maximum(b1y2, b2y2)
    enc_w = jnp.clip(enc_x2 - enc_x1, 0)
    enc_h = jnp.clip(enc_y2 - enc_y1, 0)

    if iou_mode == "iou":
        out = ious
    elif iou_mode == "ciou":
        enclose_area = enc_w**2 + enc_h**2 + eps
        rho2 = (((b2x1 + b2x2) - (b1x1 + b1x2)) ** 2 / 4
                + ((b2y1 + b2y2) - (b1y1 + b1y2)) ** 2 / 4)
        wh_ratio = (4.0 / math.pi**2) * (
            jnp.arctan(w2 / h2e) - jnp.arctan(w1 / h1e)) ** 2
        alpha = jax.lax.stop_gradient(
            wh_ratio / (wh_ratio - ious + (1 + eps)))
        out = ious - (rho2 / enclose_area + alpha * wh_ratio)
    elif iou_mode == "giou":
        convex = enc_w * enc_h + eps
        out = ious - (convex - union) / convex
    elif iou_mode == "siou":
        sigma_cw = (b2x1 + b2x2) / 2 - (b1x1 + b1x2) / 2 + eps
        sigma_ch = (b2y1 + b2y2) / 2 - (b1y1 + b1y2) / 2 + eps
        sigma = jnp.sqrt(sigma_cw**2 + sigma_ch**2)
        sin_alpha = jnp.abs(sigma_ch) / sigma
        sin_beta = jnp.abs(sigma_cw) / sigma
        sin_alpha = jnp.where(sin_alpha <= math.sin(math.pi / 4),
                              sin_alpha, sin_beta)
        angle_cost = jnp.cos(jnp.arcsin(sin_alpha) * 2 - math.pi / 2)
        rho_x = (sigma_cw / enc_w) ** 2
        rho_y = (sigma_ch / enc_h) ** 2
        gamma = 2 - angle_cost
        distance_cost = ((1 - jnp.exp(-gamma * rho_x))
                         + (1 - jnp.exp(-gamma * rho_y)))
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = ((1 - jnp.exp(-omiga_w)) ** siou_theta
                      + (1 - jnp.exp(-omiga_h)) ** siou_theta)
        out = ious - (distance_cost + shape_cost) * 0.5
    else:
        raise ValueError(f"unknown iou_mode {iou_mode!r}")
    return jnp.clip(out, -1.0, 1.0)


def pairwise_iou(boxes1: jax.Array, boxes2: jax.Array,
                 eps: float = 1e-9) -> jax.Array:
    """Plain IoU matrix between (..., M, 4) and (..., N, 4) -> (..., M, N).

    Matches yolov6_iou_calculator (assigner/utils.py:83-110): areas are
    clipped at 0 and eps is added to the union.
    """
    b1 = boxes1[..., :, None, :]
    b2 = boxes2[..., None, :, :]
    lt = jnp.maximum(b1[..., 0:2], b2[..., 0:2])
    rb = jnp.minimum(b1[..., 2:4], b2[..., 2:4])
    wh = jnp.clip(rb - lt, 0)
    overlap = wh[..., 0] * wh[..., 1]
    wh1 = jnp.clip(b1[..., 2:4] - b1[..., 0:2], 0)
    wh2 = jnp.clip(b2[..., 2:4] - b2[..., 0:2], 0)
    area1 = wh1[..., 0] * wh1[..., 1]
    area2 = wh2[..., 0] * wh2[..., 1]
    union = area1 + area2 - overlap + eps
    return overlap / union
