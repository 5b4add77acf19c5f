"""YOLOv5 legacy anchor-based head module.

Behavioral spec: reference
wedetect/models/dense_heads/yolov5_head.py:36-134 (YOLOv5HeadModule):
one 1x1 conv per pyramid level emitting num_base_priors*(5+K)
channels with attribute order [tx, ty, tw, th, obj, cls...K], plus the
YOLOv5 bias init (obj prior = 8 objects per 640 image, cls prior
0.6/(K-1)).

TPU notes: NHWC; the raw (B, H, W, A, 5+K) tensor feeds
`ops/yolov5.yolov5_decode` (inference) and
`train/yolov5_loss.yolov5_loss` (training) — both static-shape.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _bias_init(num_base_priors: int, num_out_attrib: int,
               stride: int, num_classes: int):
    """YOLOv5 head bias init (reference yolov5_head.py:91-106)."""
    def init(key, shape, dtype=jnp.float32):
        del key
        b = np.zeros((num_base_priors, num_out_attrib), np.float32)
        b[:, 4] += math.log(8 / (640 / stride) ** 2)
        if num_classes > 1:
            b[:, 5:5 + num_classes] += math.log(
                0.6 / (num_classes - 0.999999))
        return jnp.asarray(b.reshape(shape), dtype)
    return init


class YOLOv5HeadModule(nn.Module):
    """Per-level 1x1 prediction convs (the entire v5 head trunk)."""

    num_classes: int
    in_channels: Sequence[int] = (256, 512, 1024)
    widen_factor: float = 1.0
    num_base_priors: int = 3
    featmap_strides: Sequence[int] = (8, 16, 32)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]
                 ) -> List[jax.Array]:
        """feats: per-level (B, H, W, C) -> per-level raw
        (B, H, W, A, 5+K) prediction tensors."""
        assert len(feats) == len(self.featmap_strides)
        attrib = 5 + self.num_classes
        outs = []
        for i, (x, s) in enumerate(zip(feats, self.featmap_strides)):
            out = nn.Conv(
                self.num_base_priors * attrib, (1, 1), use_bias=True,
                dtype=self.dtype,
                bias_init=_bias_init(self.num_base_priors, attrib,
                                     s, self.num_classes),
                name=f"convs_pred_{i}")(x)
            b, h, w, _ = out.shape
            outs.append(out.reshape(b, h, w, self.num_base_priors,
                                    attrib))
        return outs
