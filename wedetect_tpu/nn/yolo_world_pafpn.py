"""Legacy YOLO-World text-guided necks (NHWC, flax.linen).

Behavioral spec: reference wedetect/models/layers/yolo_bricks.py:88-244,
403-457, 572-649 and wedetect/models/necks/yolo_world_pafpn.py:1144-1364
(+ yolov8_pafpn.py builders):

- CSPLayerWithTwoConv: 1x1 split into 2*mid, chain of Darknet
  bottlenecks on the second half, concat all, 1x1 out
- MaxSigmoidAttnBlock: multi-head max-over-text sigmoid gating
  (einsum 'bmchw,bnmc->bmhwn' -> max over texts -> sigmoid * scale)
- MaxSigmoidCSPLayerWithTwoConv: CSP with an extra attn branch
- ImagePoolingAttentionModule: text queries attend to 3x3-max-pooled
  pyramid features; residual scaled update of the text features
- YOLOWorldPAFPN: YOLOv8 PAFPN (nearest 2x upsample top-down, strided
  conv bottom-up) whose CSP layers take text guidance;
  YOLOWorldDualPAFPN adds the image-pooling text enhancer between the
  paths.

These are the registered-but-legacy neck options (the shipped configs
use CSPRepBiFPANNeck); provided for API/component parity.
All BN uses the head convention (eps 1e-3, torch momentum 0.03).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wedetect_tpu.nn.layers import Conv1x1, ConvBN

Dtype = Any
BN_KW = dict(bn_eps=1e-3, bn_momentum=0.97)


class DarknetBottleneck(nn.Module):
    out_ch: int
    add_identity: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.out_ch, 3, 1, "silu", dtype=self.dtype,
                   name="conv1", **BN_KW)(x, train)
        y = ConvBN(self.out_ch, 3, 1, "silu", dtype=self.dtype,
                   name="conv2", **BN_KW)(y, train)
        if self.add_identity and x.shape[-1] == self.out_ch:
            y = y + x
        return y


class CSPLayerWithTwoConv(nn.Module):
    out_ch: int
    expand_ratio: float = 0.5
    num_blocks: int = 1
    add_identity: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_ch * self.expand_ratio)
        y = ConvBN(2 * mid, 1, 1, "silu", dtype=self.dtype,
                   name="main_conv", **BN_KW)(x, train)
        parts = [y[..., :mid], y[..., mid:]]
        for i in range(self.num_blocks):
            parts.append(DarknetBottleneck(
                mid, add_identity=self.add_identity, dtype=self.dtype,
                name=f"block{i}")(parts[-1], train))
        cat = jnp.concatenate(parts, axis=-1)
        return ConvBN(self.out_ch, 1, 1, "silu", dtype=self.dtype,
                      name="final_conv", **BN_KW)(cat, train)


class MaxSigmoidAttnBlock(nn.Module):
    out_ch: int
    embed_ch: int
    num_heads: int = 1
    with_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        """x: (B, H, W, C); guide: (B, K, guide_ch)."""
        b, h, w, c = x.shape
        m = self.num_heads
        hc = self.out_ch // m
        guide = nn.Dense(self.embed_ch, dtype=self.dtype,
                         name="guide_fc")(guide)
        guide = guide.reshape(b, -1, m, self.embed_ch // m)
        if self.embed_ch != c:
            embed = ConvBN(self.embed_ch, 1, 1, None, dtype=self.dtype,
                           name="embed_conv", **BN_KW)(x, train)
        else:
            embed = x
        embed = embed.reshape(b, h, w, m, self.embed_ch // m)
        attn = jnp.einsum("bhwmc,bnmc->bmhwn", embed, guide)
        attn = attn.max(axis=-1) / (self.embed_ch // m) ** 0.5
        bias = self.param("bias", nn.initializers.zeros, (m,),
                          jnp.float32)
        attn = attn + bias[None, :, None, None].astype(attn.dtype)
        attn = jax.nn.sigmoid(attn)
        if self.with_scale:
            scale = self.param("scale", nn.initializers.ones,
                               (1, m, 1, 1), jnp.float32)
            attn = attn * scale.astype(attn.dtype)
        y = ConvBN(self.out_ch, 3, 1, None, dtype=self.dtype,
                   name="project_conv", **BN_KW)(x, train)
        y = y.reshape(b, h, w, m, hc)
        y = y * attn.transpose(0, 2, 3, 1)[..., None]
        return y.reshape(b, h, w, self.out_ch)


class MaxSigmoidCSPLayerWithTwoConv(nn.Module):
    out_ch: int
    embed_ch: int
    num_heads: int = 1
    expand_ratio: float = 0.5
    num_blocks: int = 1
    add_identity: bool = False
    with_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        mid = int(self.out_ch * self.expand_ratio)
        y = ConvBN(2 * mid, 1, 1, "silu", dtype=self.dtype,
                   name="main_conv", **BN_KW)(x, train)
        parts = [y[..., :mid], y[..., mid:]]
        for i in range(self.num_blocks):
            parts.append(DarknetBottleneck(
                mid, add_identity=self.add_identity, dtype=self.dtype,
                name=f"block{i}")(parts[-1], train))
        parts.append(MaxSigmoidAttnBlock(
            mid, self.embed_ch, num_heads=self.num_heads,
            with_scale=self.with_scale, dtype=self.dtype,
            name="attn_block")(parts[-1], guide, train))
        cat = jnp.concatenate(parts, axis=-1)
        return ConvBN(self.out_ch, 1, 1, "silu", dtype=self.dtype,
                      name="final_conv", **BN_KW)(cat, train)


def _adaptive_max_pool(x, out: int):
    """NHWC adaptive max pool to (out, out) (torch semantics)."""
    import math

    b, h, w, c = x.shape
    ys = [((i * h) // out, math.ceil((i + 1) * h / out))
          for i in range(out)]
    xs = [((j * w) // out, math.ceil((j + 1) * w / out))
          for j in range(out)]
    rows = []
    for y0, y1 in ys:
        cols = [x[:, y0:y1, x0:x1].max(axis=(1, 2)) for x0, x1 in xs]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)        # (B, out, out, C)


class ImagePoolingAttentionModule(nn.Module):
    text_ch: int
    embed_ch: int
    num_feats: int = 3
    num_heads: int = 8
    pool_size: int = 3
    with_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, feats: Sequence[jax.Array],
                 train: bool = False):
        b = feats[0].shape[0]
        hc = self.embed_ch // self.num_heads
        pooled = []
        for i, f in enumerate(feats):
            # reference: mmcv ConvModule(in, embed, 1, act_cfg=None) with
            # the DEFAULT norm_cfg=None -> plain Conv2d WITH bias, no BN
            # (yolo_bricks.py:597-600)
            p = Conv1x1(self.embed_ch, dtype=self.dtype,
                        name=f"projection{i}")(f)
            p = _adaptive_max_pool(p, self.pool_size)
            pooled.append(p.reshape(b, -1, self.embed_ch))
        img = jnp.concatenate(pooled, axis=1)   # (B, P, E)

        def ln_linear(name, x, out):
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"{name}_ln")(x).astype(self.dtype)
            return nn.Dense(out, dtype=self.dtype, name=f"{name}_fc")(x)

        q = ln_linear("query", text, self.embed_ch)
        k = ln_linear("key", img, self.embed_ch)
        v = ln_linear("value", img, self.embed_ch)
        q = q.reshape(b, -1, self.num_heads, hc)
        k = k.reshape(b, -1, self.num_heads, hc)
        v = v.reshape(b, -1, self.num_heads, hc)
        attn = jnp.einsum("bnmc,bkmc->bmnk", q, k) / hc ** 0.5
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
        out = jnp.einsum("bmnk,bkmc->bnmc", attn, v)
        out = nn.Dense(self.text_ch, dtype=self.dtype, name="proj")(
            out.reshape(b, -1, self.embed_ch))
        if self.with_scale:
            scale = self.param("scale", nn.initializers.zeros, (1,),
                               jnp.float32).astype(out.dtype)
        else:
            scale = 1.0
        return out * scale + text


class YOLOWorldPAFPN(nn.Module):
    """Text-guided YOLOv8 PAFPN over 3 levels."""

    out_channels: Tuple[int, ...] = (256, 512, 1024)
    embed_channels: Tuple[int, ...] = (128, 256, 512)
    num_heads: Tuple[int, ...] = (4, 8, 16)
    num_csp_blocks: int = 3
    dual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], text,
                 train: bool = False):
        n = len(feats)
        assert n == len(self.out_channels)
        # top-down
        inner = [feats[-1]]
        for idx in range(n - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(inner[0], 2, axis=1), 2, axis=2)
            cat = jnp.concatenate([up, feats[idx - 1]], axis=-1)
            inner.insert(0, MaxSigmoidCSPLayerWithTwoConv(
                self.out_channels[idx - 1],
                self.embed_channels[idx - 1],
                num_heads=self.num_heads[idx - 1],
                num_blocks=self.num_csp_blocks, dtype=self.dtype,
                name=f"top_down{n - 1 - idx}")(cat, text, train))
        if self.dual:
            text = ImagePoolingAttentionModule(
                text_ch=text.shape[-1], embed_ch=256,
                num_feats=n, dtype=self.dtype,
                name="text_enhancer")(text, inner, train)
        # bottom-up
        outs = [inner[0]]
        for idx in range(n - 1):
            down = ConvBN(self.out_channels[idx], 3, 2, "silu",
                          dtype=self.dtype, name=f"downsample{idx}",
                          **BN_KW)(outs[-1], train)
            cat = jnp.concatenate([down, inner[idx + 1]], axis=-1)
            outs.append(MaxSigmoidCSPLayerWithTwoConv(
                self.out_channels[idx + 1],
                self.embed_channels[idx + 1],
                num_heads=self.num_heads[idx + 1],
                num_blocks=self.num_csp_blocks, dtype=self.dtype,
                name=f"bottom_up{idx}")(cat, text, train))
        return tuple(outs)


class VanillaSigmoidBlock(nn.Module):
    """Projection-only 'attention' block (reference
    yolo_bricks.py:651-694 — the sigmoid gating is commented out
    upstream, leaving a plain conv that ignores the guide)."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        del guide
        return ConvBN(self.out_ch, 3, 1, None, dtype=self.dtype,
                      name="project_conv", **BN_KW)(x, train)


class EfficientCSPLayerWithTwoConv(nn.Module):
    """CSP layer whose extra branch is a VanillaSigmoidBlock
    (reference yolo_bricks.py:696-749)."""

    out_ch: int
    expand_ratio: float = 0.5
    num_blocks: int = 1
    add_identity: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        mid = int(self.out_ch * self.expand_ratio)
        y = ConvBN(2 * mid, 1, 1, "silu", dtype=self.dtype,
                   name="main_conv", **BN_KW)(x, train)
        parts = [y[..., :mid], y[..., mid:]]
        for i in range(self.num_blocks):
            parts.append(DarknetBottleneck(
                mid, add_identity=self.add_identity, dtype=self.dtype,
                name=f"block{i}")(parts[-1], train))
        parts.append(VanillaSigmoidBlock(
            mid, dtype=self.dtype, name="attn_block")(
                parts[-1], guide, train))
        cat = jnp.concatenate(parts, axis=-1)
        return ConvBN(self.out_ch, 1, 1, "silu", dtype=self.dtype,
                      name="final_conv", **BN_KW)(cat, train)


class CSPLayer(nn.Module):
    """mmdet-style C3 CSP layer (YOLOv5 neck brick).

    Behavioral spec: mmdet CSPLayer as used by reference
    wedetect/models/necks/yolov5_pafpn.py:113-175 — main/short 1x1
    convs to out*expand channels, N darknet bottlenecks (1x1 -> 3x3)
    on the main path, concat, final 1x1.
    """

    out_ch: int
    expand_ratio: float = 0.5
    num_blocks: int = 1
    add_identity: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_ch * self.expand_ratio)
        main = ConvBN(mid, 1, 1, "silu", dtype=self.dtype,
                      name="main_conv", **BN_KW)(x, train)
        short = ConvBN(mid, 1, 1, "silu", dtype=self.dtype,
                       name="short_conv", **BN_KW)(x, train)
        for i in range(self.num_blocks):
            y = ConvBN(mid, 1, 1, "silu", dtype=self.dtype,
                       name=f"block{i}_conv1", **BN_KW)(main, train)
            y = ConvBN(mid, 3, 1, "silu", dtype=self.dtype,
                       name=f"block{i}_conv2", **BN_KW)(y, train)
            main = main + y if self.add_identity else y
        cat = jnp.concatenate([main, short], axis=-1)
        return ConvBN(self.out_ch, 1, 1, "silu", dtype=self.dtype,
                      name="final_conv", **BN_KW)(cat, train)


def _upsample2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class YOLOv5PAFPN(nn.Module):
    """Text-free YOLOv5 PAFPN (registered-but-unused upstream).

    Behavioral spec: reference
    wedetect/models/necks/yolov5_pafpn.py:26-181 over the
    BaseYOLONeck forward (base_yolo_neck.py:15-261): reduce the top
    level 1x1, nearest-2x upsample + concat + C3 top-down (with a
    trailing 1x1 reduce on the upper level), strided-conv downsample
    + concat + C3 bottom-up. in_channels == out_channels per level.
    """

    channels: Tuple[int, ...] = (256, 512, 1024)
    num_csp_blocks: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array],
                 train: bool = False):
        ch = self.channels
        n = len(ch)
        assert n == 3, "3-level PAFPN"
        reduce_top = ConvBN(ch[-2], 1, 1, "silu", dtype=self.dtype,
                            name="reduce2", **BN_KW)(feats[-1], train)
        reduced = [feats[0], feats[1], reduce_top]

        # top-down
        inner = [reduced[-1]]
        for idx in range(n - 1, 0, -1):
            cat = jnp.concatenate([_upsample2x(inner[0]),
                                   reduced[idx - 1]], axis=-1)
            y = CSPLayer(ch[idx - 1], num_blocks=self.num_csp_blocks,
                         add_identity=False, dtype=self.dtype,
                         name=f"top_down{n - 1 - idx}")(cat, train)
            if idx != 1:
                y = ConvBN(ch[idx - 2], 1, 1, "silu", dtype=self.dtype,
                           name=f"top_down{n - 1 - idx}_reduce",
                           **BN_KW)(y, train)
            inner.insert(0, y)

        # bottom-up
        outs = [inner[0]]
        for idx in range(n - 1):
            down = ConvBN(outs[-1].shape[-1], 3, 2, "silu",
                          dtype=self.dtype, name=f"downsample{idx}",
                          **BN_KW)(outs[-1], train)
            cat = jnp.concatenate([down, inner[idx + 1]], axis=-1)
            outs.append(CSPLayer(
                ch[idx + 1], num_blocks=self.num_csp_blocks,
                add_identity=False, dtype=self.dtype,
                name=f"bottom_up{idx}")(cat, train))
        return tuple(outs)


class YOLOv8PAFPN(nn.Module):
    """Text-free YOLOv8 PAFPN: the YOLOWorldPAFPN topology with plain
    CSPLayerWithTwoConv fusion (reference
    wedetect/models/necks/yolov8_pafpn.py:25-113)."""

    out_channels: Tuple[int, ...] = (256, 512, 1024)
    num_csp_blocks: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array],
                 train: bool = False):
        n = len(feats)
        inner = [feats[-1]]
        for idx in range(n - 1, 0, -1):
            cat = jnp.concatenate([_upsample2x(inner[0]),
                                   feats[idx - 1]], axis=-1)
            inner.insert(0, CSPLayerWithTwoConv(
                self.out_channels[idx - 1],
                num_blocks=self.num_csp_blocks, add_identity=False,
                dtype=self.dtype,
                name=f"top_down{n - 1 - idx}")(cat, train))
        outs = [inner[0]]
        for idx in range(n - 1):
            down = ConvBN(self.out_channels[idx], 3, 2, "silu",
                          dtype=self.dtype, name=f"downsample{idx}",
                          **BN_KW)(outs[-1], train)
            cat = jnp.concatenate([down, inner[idx + 1]], axis=-1)
            outs.append(CSPLayerWithTwoConv(
                self.out_channels[idx + 1],
                num_blocks=self.num_csp_blocks, add_identity=False,
                dtype=self.dtype,
                name=f"bottom_up{idx}")(cat, train))
        return tuple(outs)
