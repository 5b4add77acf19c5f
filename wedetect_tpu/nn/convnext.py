"""ConvNeXt vision backbone (NHWC, flax.linen).

Behavioral spec: reference generate_proposal.py:138-299 and
wedetect/models/backbones/mm_backbone.py:82-255 — stem 4x4/s4 conv + LN,
three LN + 2x2/s2 downsample layers, stages of blocks
(7x7 depthwise conv -> LN -> Linear 4x -> GELU -> Linear -> layer-scale
gamma -> residual). Emits the 4-level pyramid (c1..c4, strides 4/8/16/32).

TPU notes: in NHWC the reference's two LayerNorm data formats collapse
into one (both normalize over the channel axis only). The depthwise 7x7
runs on the VPU; the two Linears are MXU matmuls over the channel axis.
LayerNorm statistics are computed in f32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LayerNormF32(nn.Module):
    """LayerNorm over the trailing channel axis with f32 statistics."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class ConvNeXtBlock(nn.Module):
    """7x7 dwconv -> LN -> Linear(4x) -> GELU -> Linear -> gamma ->
    droppath -> res (reference mm_backbone.py:94-124; stochastic depth
    zeroes the whole residual branch per sample, scaling survivors by
    1/keep)."""

    dim: int
    layer_scale_init: float = 1e-6
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool = False  # int8 MLP matmuls (inference only)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dg = None
        if self.quant:
            from wedetect_tpu.ops.int8 import quant_dot_general
            dg = quant_dot_general
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, use_bias=True,
                    dtype=self.dtype, name="dwconv")(x)
        x = LayerNormF32(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, dot_general=dg,
                     name="pwconv1")(x)
        x = jax.nn.gelu(x.astype(jnp.float32),
                        approximate=False).astype(self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, dot_general=dg,
                     name="pwconv2")(x)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,), jnp.float32)
            x = x * gamma.astype(self.dtype)
        if self.drop_path > 0 and not deterministic:
            keep = 1.0 - self.drop_path
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = jax.random.bernoulli(self.make_rng("dropout"),
                                        keep, shape)
            x = jnp.where(mask, x / keep, jnp.zeros_like(x))
        return inp + x


class ConvNeXt(nn.Module):
    """4-stage ConvNeXt returning (c1, c2, c3, c4) NHWC feature maps."""

    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (128, 256, 512, 1024)
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool = False  # int8 block MLPs (inference only: the int8
    # rounding has no useful gradient — see ops/int8.py)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # per-block rates linspaced 0..rate over all blocks
        # (reference mm_backbone.py:214-216 dp_rates)
        total = sum(self.depths)
        rates = [self.drop_path_rate * k / max(total - 1, 1)
                 for k in range(total)]
        outs = []
        b = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                            padding="VALID", use_bias=True,
                            dtype=self.dtype, name="stem_conv")(x)
                x = LayerNormF32(dtype=self.dtype, name="stem_norm")(x)
            else:
                x = LayerNormF32(dtype=self.dtype, name=f"down{i}_norm")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2),
                            padding="VALID", use_bias=True,
                            dtype=self.dtype, name=f"down{i}_conv")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], drop_path=rates[b],
                                  dtype=self.dtype, quant=self.quant,
                                  name=f"stage{i}_block{j}")(
                    x, deterministic=deterministic)
                b += 1
            outs.append(x)
        return tuple(outs)
