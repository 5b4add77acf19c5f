"""YOLOv5 legacy anchor-based training loss, static shapes.

Behavioral spec: reference
wedetect/models/dense_heads/yolov5_head.py:474-700 (loss_by_feat +
_convert_gt_to_norm_format + _decode_bbox_to_xywh):

per level i with feature grid (H, W) and 3 base priors (grid units):
  1. gt cxcywh normalized to [0,1] then scaled to grid units;
  2. shape match: max(wh_ratio, 1/wh_ratio).max() < prior_match_thr(4);
  3. neighbor expansion: besides the center cell, the left/up/right/
     bottom neighbor cell also becomes positive when the center falls
     in the nearer half of its cell (near_neighbor_thr=0.5) and is not
     on the border;
  4. box loss: CIoU(decoded xywh, [cell-relative xy, grid wh]), mean
     over positives, weight 0.05;
  5. obj loss: BCE over the full (B, A, H, W) grid against the
     detached clamped CIoU scattered at positives, weight 1.0, level
     balance weights (4.0, 1.0, 0.4);
  6. cls loss: BCE(one-hot) mean over positive x class elements,
     weight 0.5 (zero when num_classes == 1);
  each scaled by batch x world (here: `loss_scale`).

TPU re-design: instead of boolean-indexing a variable-length positive
set, every (offset o in 5, prior a in 3, gt g in G) triple is a
static candidate slot with a validity mask; predictions are gathered
at clamped indices and reduced as masked sum / count. Where the torch
code scatters CIoU into the obj target with last-write-wins on
duplicate (cell, prior) slots, we scatter-max — deterministic, and
identical whenever duplicates don't collide.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wedetect_tpu.ops.boxes import bbox_overlaps_aligned
from wedetect_tpu.ops.yolov5 import DEFAULT_ANCHORS
from wedetect_tpu.train.losses import bce_with_logits


class V5Losses(NamedTuple):
    total: jax.Array
    cls: jax.Array
    obj: jax.Array
    bbox: jax.Array
    num_pos: jax.Array


def _cxcywh_to_xyxy(xy: jax.Array, wh: jax.Array) -> jax.Array:
    half = wh / 2
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def yolov5_loss(preds: Sequence[jax.Array],
                gt_boxes: jax.Array,
                gt_labels: jax.Array,
                gt_mask: jax.Array,
                img_hw: Tuple[int, int],
                anchors=DEFAULT_ANCHORS,
                strides: Sequence[int] = (8, 16, 32),
                prior_match_thr: float = 4.0,
                near_neighbor_thr: float = 0.5,
                obj_level_weights: Sequence[float] = (4.0, 1.0, 0.4),
                loss_cls_weight: float = 0.5,
                loss_obj_weight: float = 1.0,
                loss_bbox_weight: float = 0.05,
                loss_scale: float = 1.0) -> V5Losses:
    """preds: per-level raw (B, H, W, A, 5+K); gt_boxes (B, G, 4) xyxy
    in input-image pixels; gt_labels (B, G) int; gt_mask (B, G) bool.
    """
    img_h, img_w = img_hw
    f32 = jnp.float32
    b, g = gt_boxes.shape[:2]
    num_classes = preds[0].shape[-1] - 5

    x1, y1, x2, y2 = (gt_boxes[..., i].astype(f32) for i in range(4))
    # normalized cxcywh (reference :646-668)
    ncx, ncy = (x1 + x2) / 2 / img_w, (y1 + y2) / 2 / img_h
    nw, nh = (x2 - x1) / img_w, (y2 - y1) / img_h

    offs = jnp.asarray([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], f32)

    loss_cls = jnp.zeros((), f32)
    loss_obj = jnp.zeros((), f32)
    loss_box = jnp.zeros((), f32)
    num_pos = jnp.zeros((), f32)

    for i, (pred, stride) in enumerate(zip(preds, strides)):
        _, fh, fw, a, _ = pred.shape
        pred = pred.astype(f32)
        prior_wh = jnp.asarray(np.asarray(anchors[i], np.float32)
                               / stride)                     # (A, 2)

        tcx, tcy = ncx * fw, ncy * fh                        # (B, G)
        twh = jnp.stack([nw * fw, nh * fh], -1)              # (B, G, 2)

        # 2. shape match (B, A, G)
        r = twh[:, None] / prior_wh[None, :, None]           # (B,A,G,2)
        match = jnp.maximum(r, 1.0 / r).max(-1) < prior_match_thr
        match = match & gt_mask[:, None, :]

        # 3. neighbor-cell masks (B, G) each
        thr = near_neighbor_thr
        left = (tcx % 1 < thr) & (tcx > 1)
        up = (tcy % 1 < thr) & (tcy > 1)
        right = ((fw - tcx) % 1 < thr) & ((fw - tcx) > 1)
        bottom = ((fh - tcy) % 1 < thr) & ((fh - tcy) > 1)
        keep = jnp.stack([jnp.ones_like(left), left, up, right,
                          bottom], 1)                        # (B, 5, G)

        valid = (match[:, None] & keep[:, :, None])          # (B,5,A,G)

        # candidate grid cells, one per offset (B, 5, G)
        gx = jnp.floor(tcx[:, None] - offs[None, :, 0:1] * thr)
        gy = jnp.floor(tcy[:, None] - offs[None, :, 1:2] * thr)
        gx = jnp.clip(gx, 0, fw - 1).astype(jnp.int32)
        gy = jnp.clip(gy, 0, fh - 1).astype(jnp.int32)

        # flatten candidates (B, N), N = 5*A*G
        n = 5 * a * g
        bc = lambda x: jnp.broadcast_to(x, (b, 5, a, g)).reshape(b, n)
        gxc = bc(gx[:, :, None, :])
        gyc = bc(gy[:, :, None, :])
        vc = bc(valid)
        # per-candidate prior index / wh
        pidx = jnp.broadcast_to(jnp.arange(a)[None, None, :, None],
                                (b, 5, a, g)).reshape(b, n)
        pwh = prior_wh[pidx]                                 # (B,N,2)
        txyc = jnp.stack([bc(tcx[:, None, None, :]),
                          bc(tcy[:, None, None, :])], -1)    # (B,N,2)
        twhc = jnp.stack([bc(twh[:, None, None, :, 0]),
                          bc(twh[:, None, None, :, 1])], -1)
        labc = bc(gt_labels[:, None, None, :].astype(jnp.int32))

        # gather predictions at (gy, gx, prior)
        flat = pred.reshape(b, fh * fw * a, 5 + num_classes)
        lin = (gyc * fw + gxc) * a + pidx                    # (B, N)
        pc = jnp.take_along_axis(flat, lin[..., None], axis=1)

        # 4. box loss (reference _decode_bbox_to_xywh :695-700)
        pxy = jax.nn.sigmoid(pc[..., 0:2]) * 2 - 0.5
        pwh_dec = (jax.nn.sigmoid(pc[..., 2:4]) * 2) ** 2 * pwh
        tgt_xy = txyc - jnp.stack([gxc, gyc], -1).astype(f32)
        ciou = bbox_overlaps_aligned(
            _cxcywh_to_xyxy(pxy, pwh_dec),
            _cxcywh_to_xyxy(tgt_xy, twhc), iou_mode="ciou")  # (B, N)
        vf = vc.astype(f32)
        cnt = vf.sum()
        loss_box += ((1.0 - ciou) * vf).sum() / jnp.maximum(cnt, 1.0)
        num_pos += cnt

        # 5. obj loss: scatter detached iou into the full grid
        iou_t = jnp.where(vc, jnp.clip(jax.lax.stop_gradient(ciou),
                                       0.0), 0.0)
        tgt_obj = jnp.zeros((b, fh * fw * a), f32)
        tgt_obj = tgt_obj.at[jnp.arange(b)[:, None], lin].max(iou_t)
        loss_obj += (bce_with_logits(flat[..., 4], tgt_obj).mean()
                     * obj_level_weights[i])

        # 6. cls loss
        if num_classes > 1:
            tcls = jax.nn.one_hot(labc, num_classes, dtype=f32)
            lc = bce_with_logits(pc[..., 5:], tcls) * vf[..., None]
            loss_cls += lc.sum() / jnp.maximum(cnt * num_classes, 1.0)

    loss_cls = loss_cls * loss_cls_weight * loss_scale
    loss_obj = loss_obj * loss_obj_weight * loss_scale
    loss_box = loss_box * loss_bbox_weight * loss_scale
    return V5Losses(total=loss_cls + loss_obj + loss_box,
                    cls=loss_cls, obj=loss_obj, bbox=loss_box,
                    num_pos=num_pos)
