"""YOLOv5 legacy anchor-based decode.

Behavioral spec: reference wedetect/models/dense_heads/yolov5_head.py
(YOLOv5HeadModule/Head, the anchor-based ancestor kept for API
parity; WeDetect itself is anchor-free): per level, 3 base anchors;
raw (B, H, W, 3, 5+K) predictions decode as

    xy = (sigmoid(txy) * 2 - 0.5 + grid) * stride
    wh = (sigmoid(twh) * 2)^2 * anchor
    score = sigmoid(obj) * sigmoid(cls)

followed by the shared filter_scores_and_topk / NMS machinery
(ops/nms.py).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the standard YOLOv5 COCO anchors (w, h) per level, strides 8/16/32
DEFAULT_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


def yolov5_decode_level(pred: jax.Array, anchors, stride: int
                        ) -> Tuple[jax.Array, jax.Array]:
    """pred (B, H, W, A, 5+K) raw -> (boxes (B, H*W*A, 4) xyxy,
    scores (B, H*W*A, K))."""
    b, h, w, a, _ = pred.shape
    pred = jax.nn.sigmoid(pred.astype(jnp.float32))
    gx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    anc = jnp.asarray(np.asarray(anchors, np.float32))  # (A, 2)
    cx = (pred[..., 0] * 2 - 0.5 + gx[None]) * stride
    cy = (pred[..., 1] * 2 - 0.5 + gy[None]) * stride
    bw = (pred[..., 2] * 2) ** 2 * anc[None, None, None, :, 0]
    bh = (pred[..., 3] * 2) ** 2 * anc[None, None, None, :, 1]
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2,
                       cx + bw / 2, cy + bh / 2], axis=-1)
    scores = pred[..., 5:] * pred[..., 4:5]
    return (boxes.reshape(b, h * w * a, 4),
            scores.reshape(b, h * w * a, -1))


def yolov5_decode(preds: Sequence[jax.Array],
                  anchors=DEFAULT_ANCHORS,
                  strides: Sequence[int] = (8, 16, 32)
                  ) -> Tuple[jax.Array, jax.Array]:
    """Multi-level decode -> concatenated (B, N, 4) / (B, N, K)."""
    boxes, scores = [], []
    for p, anc, s in zip(preds, anchors, strides):
        bx, sc = yolov5_decode_level(p, anc, s)
        boxes.append(bx)
        scores.append(sc)
    return jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1)
