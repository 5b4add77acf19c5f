"""Basic conv bricks: Conv+BN+act, 2x transposed conv, BottleRep, BepC3.

Semantics match the reference bricks (behavioral spec:
reference generate_proposal.py:317-465 — ConvModule_torch, ConvBNReLU,
ConvBNSiLU, BottleRep, RepBlock, BepC3, Transpose, BiFusion), built
TPU-first: NHWC layout, explicit symmetric padding (torch pad=k//2, NOT
XLA 'SAME', which pads asymmetrically for even inputs at stride 2),
bf16-friendly with f32 batch-norm statistics.

BatchNorm defaults to the torch nn.BatchNorm2d settings the neck bricks
use (eps 1e-5, torch momentum 0.1 = flax 0.9); the head towers override
to eps 1e-3 / torch momentum 0.03. Cross-replica stat sync goes through
`axis_name` (the TPU-native replacement for SyncBatchNorm).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

ACTS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "hardswish": jax.nn.hard_swish,
    None: lambda x: x,
}


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation.

    In `deploy` mode the BN is assumed folded into the conv, which then
    carries a bias (use `wedetect_tpu.ckpt.fuse` to fold a trained
    checkpoint).
    """

    out_ch: int
    kernel: int = 3
    stride: int = 1
    act: Optional[str] = "silu"
    groups: int = 1
    deploy: bool = False
    bn_eps: float = 1e-5       # torch nn.BatchNorm2d default (neck bricks)
    bn_momentum: float = 0.9   # = torch momentum 0.1
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant: bool = False        # int8 conv (inference only; ops/int8.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        cg = None
        if self.quant:
            from wedetect_tpu.ops.int8 import quant_conv_general
            cg = quant_conv_general
        p = self.kernel // 2
        x = nn.Conv(
            self.out_ch, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            use_bias=self.deploy,
            dtype=self.dtype,
            conv_general_dilated=cg,
            name="conv",
        )(x)
        if not self.deploy:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum, epsilon=self.bn_eps,
                axis_name=self.bn_axis_name if train else None,
                dtype=jnp.float32,
                name="bn",
            )(x).astype(self.dtype)
        return ACTS[self.act](x)


class Conv1x1(nn.Module):
    """Plain 1x1 conv with bias (prediction layers)."""

    out_ch: int
    kernel: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        return nn.Conv(self.out_ch, (self.kernel, self.kernel),
                       padding=[(p, p), (p, p)], use_bias=True,
                       dtype=self.dtype, name="conv")(x)


class Transpose2x(nn.Module):
    """ConvTranspose2d(kernel=2, stride=2, bias=True) — exact 2x upsample.

    Implemented as a 1x1 matmul to 4*out channels followed by
    depth-to-space: out[2i+di, 2j+dj, o] = sum_c in[i,j,c] * W[c,o,di,dj].
    This is mathematically identical to the torch op (no kernel overlap
    at k=2/s=2) and maps onto the MXU as one big matmul.

    Param `kernel` is stored in torch layout (in_ch, out_ch, 2, 2) so the
    checkpoint converter is a straight copy.
    """

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (c, self.out_ch, 2, 2), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_ch,), jnp.float32)
        k = kernel.astype(self.dtype).reshape(c, self.out_ch * 4)
        y = jnp.einsum("bhwc,ck->bhwk", x, k)  # (b,h,w, out*2*2)
        y = y.reshape(b, h, w, self.out_ch, 2, 2)
        y = y.transpose(0, 1, 4, 2, 5, 3)      # b, h, di, w, dj, o
        y = y.reshape(b, h * 2, w * 2, self.out_ch)
        return y + bias.astype(self.dtype)


class BottleRep(nn.Module):
    """Two 3x3 ConvBNSiLU + learnable-alpha residual.

    Reference behavior: generate_proposal.py:387-405 (BottleRep with
    weight=True; shortcut iff in_ch == out_ch).
    """

    out_ch: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.out_ch, 3, 1, "silu", dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, quant=self.quant,
                   name="conv1")(x, train)
        y = ConvBN(self.out_ch, 3, 1, "silu", dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, quant=self.quant,
                   name="conv2")(y, train)
        if self.shortcut:
            alpha = self.param("alpha", nn.initializers.ones, (1,),
                               jnp.float32)
            y = y + alpha.astype(self.dtype) * x
        return y


class RepBlock(nn.Module):
    """Stack of BottleReps: 1 + max(n//2 - 1, 0) blocks.

    Reference behavior: generate_proposal.py:369-384.
    """

    out_ch: int
    n: int = 1
    first_shortcut: bool = True
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BottleRep(self.out_ch, shortcut=self.first_shortcut,
                      dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                      quant=self.quant, name="conv1")(x, train)
        extra = max(self.n // 2 - 1, 0)
        for i in range(extra):
            x = BottleRep(self.out_ch, shortcut=True, dtype=self.dtype,
                          bn_axis_name=self.bn_axis_name,
                          quant=self.quant,
                          name=f"block_{i}")(x, train)
        return x


class BepC3(nn.Module):
    """CSPStackRep block: split 1x1s, RepBlock branch, concat, 1x1 out.

    Reference behavior: generate_proposal.py:408-423 (BepC3 with
    ConvBNSiLU basic block, e=0.5).
    """

    out_ch: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_ch * self.e)
        in_ch = x.shape[-1]
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant=self.quant)
        del in_ch
        a = ConvBN(c_, 1, 1, "silu", name="cv1", **kw)(x, train)
        # RepBlock's first BottleRep has in=c_, out=c_ here, so its
        # residual shortcut is always active.
        a = RepBlock(c_, n=self.n, first_shortcut=True, name="m",
                     **kw)(a, train)
        b = ConvBN(c_, 1, 1, "silu", name="cv2", **kw)(x, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBN(self.out_ch, 1, 1, "silu", name="cv3", **kw)(y, train)


class BiFusion(nn.Module):
    """3-way fusion: upsample(high) + 1x1(mid) + downsample(1x1(low)).

    Reference behavior: generate_proposal.py:442-465. cv1/cv2/cv3 and
    the downsample use ReLU (ConvBNReLU); upsample is Transpose2x.
    Forward: cat(upsample(x0), cv1(x1), downsample(cv2(x2))) -> cv3.
    """

    out_ch: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x0, x1, x2, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant=self.quant)
        up = Transpose2x(self.out_ch, dtype=self.dtype,
                         name="upsample")(x0)
        mid = ConvBN(self.out_ch, 1, 1, "relu", name="cv1", **kw)(x1, train)
        low = ConvBN(self.out_ch, 1, 1, "relu", name="cv2", **kw)(x2, train)
        low = ConvBN(self.out_ch, 3, 2, "relu", name="downsample",
                     **kw)(low, train)
        y = jnp.concatenate([up, mid, low], axis=-1)
        return ConvBN(self.out_ch, 1, 1, "relu", name="cv3", **kw)(y, train)


class RepVGGBlock(nn.Module):
    """Rep-style basic block: 3x3 ConvBN + 1x1 ConvBN + identity BN,
    summed then ReLU; deploy form is a single fused 3x3 conv.

    Behavioral spec: reference yolo_world_pafpn.py:211-334 (RepVGGBlock
    with get_equivalent_kernel_bias / switch_to_deploy). This is the
    optional `block` choice of the neck stage blocks (shipped configs
    use ConvBNSiLU). The fuse here folds the branch BNs into the conv
    weights (the standard RepVGG algebra).
    """

    out_ch: int
    stride: int = 1
    deploy: bool = False
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            y = nn.Conv(self.out_ch, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=[(1, 1), (1, 1)], use_bias=True,
                        dtype=self.dtype, name="reparam")(x)
            return jax.nn.relu(y)
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        dense = ConvBN(self.out_ch, 3, self.stride, None,
                       name="rbr_dense", **kw)(x, train)
        one = ConvBN(self.out_ch, 1, self.stride, None,
                     name="rbr_1x1", **kw)(x, train)
        y = dense + one
        if x.shape[-1] == self.out_ch and self.stride == 1:
            ident = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
                dtype=jnp.float32, name="rbr_identity",
            )(x).astype(self.dtype)
            y = y + ident
        return jax.nn.relu(y)


def repvgg_fuse(params: dict, stats: dict) -> dict:
    """Fold a RepVGGBlock's branches into the deploy 3x3 conv params.

    Returns {"reparam": {"kernel", "bias"}} (HWIO kernel).
    """
    def fold(p, s, eps=1e-5):
        k = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + eps)
        return (p["conv"]["kernel"] * k[None, None, None, :],
                p["bn"]["bias"] - s["bn"]["mean"] * k)

    k3, b3 = fold(params["rbr_dense"], stats["rbr_dense"])
    k1, b1 = fold(params["rbr_1x1"], stats["rbr_1x1"])
    k1 = jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    kernel = k3 + k1
    bias = b3 + b1
    if "rbr_identity" in params:
        cin = kernel.shape[2]
        s = stats["rbr_identity"]
        p = params["rbr_identity"]
        kid = p["scale"] / jnp.sqrt(s["var"] + 1e-5)
        eye = jnp.zeros((3, 3, cin, cin)).at[1, 1].set(jnp.eye(cin))
        kernel = kernel + eye * kid[None, None, None, :]
        bias = bias + p["bias"] - s["mean"] * kid
    return {"reparam": {"kernel": kernel, "bias": bias}}
