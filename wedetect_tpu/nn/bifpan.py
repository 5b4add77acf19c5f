"""CSPRepBiFPAN neck (NHWC, flax.linen).

Behavioral spec: reference generate_proposal.py:470-578 and
wedetect/models/necks/yolo_world_pafpn.py:988-1137 — takes the 4-level
ConvNeXt pyramid (c1..c4, strides 4/8/16/32), emits 3 levels
(P3/P4/P5, strides 8/16/32):

    fpn_out0 = reduce0(c4)                         # 256s @ s32
    f_out0   = Rep_p4(BiFusion0(fpn_out0, c3, c2)) # 256s @ s16
    fpn_out1 = reduce1(f_out0)                     # 128s @ s16
    P3       = Rep_p3(BiFusion1(fpn_out1, c2, c1)) # 128s @ s8
    P4       = Rep_n3(cat(down2(P3), fpn_out1))    # 256s @ s16
    P5       = Rep_n4(cat(down1(P4), fpn_out0))    # 512s @ s32

Base channel list [.., 256, 128, 128, 256, 256, 512] scaled by
`scale` with int() truncation; reduce/downsample bricks are ReLU,
BepC3 stacks are SiLU.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from wedetect_tpu.nn.layers import BepC3, BiFusion, ConvBN

Dtype = Any


class CSPRepBiFPANNeck(nn.Module):
    scale: float = 1.0
    repeats: int = 12
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant: bool = False  # int8 convs (inference only; ops/int8.py)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c1, c2, c3, c4 = feats
        s = self.scale
        ch = lambda c: int(c * s)  # noqa: E731
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant=self.quant)
        n = self.repeats

        fpn_out0 = ConvBN(ch(256), 1, 1, "relu", name="reduce0",
                          **kw)(c4, train)
        f0 = BiFusion(ch(256), name="bifusion0",
                      **kw)(fpn_out0, c3, c2, train)
        f_out0 = BepC3(ch(256), n=n, name="rep_p4", **kw)(f0, train)

        fpn_out1 = ConvBN(ch(128), 1, 1, "relu", name="reduce1",
                          **kw)(f_out0, train)
        f1 = BiFusion(ch(128), name="bifusion1",
                      **kw)(fpn_out1, c2, c1, train)
        p3 = BepC3(ch(128), n=n, name="rep_p3", **kw)(f1, train)

        d1 = ConvBN(ch(128), 3, 2, "relu", name="downsample2",
                    **kw)(p3, train)
        p4 = BepC3(ch(256), n=n, name="rep_n3",
                   **kw)(jnp.concatenate([d1, fpn_out1], -1), train)

        d0 = ConvBN(ch(256), 3, 2, "relu", name="downsample1",
                    **kw)(p4, train)
        p5 = BepC3(ch(512), n=n, name="rep_n4",
                   **kw)(jnp.concatenate([d0, fpn_out0], -1), train)

        return p3, p4, p5
