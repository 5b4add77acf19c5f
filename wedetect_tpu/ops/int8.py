"""Dynamic int8 matmul/conv for the quantized detect path.

The detector's inference FLOPs are dominated by channel-mixing matmuls
(ConvNeXt block MLPs; neck/head convs — SURVEY.md §3.1 hot loops): the
bf16 path runs them on the MXU at ~61% of the chip's bf16 peak
(PERF.md "Where the time goes"), and the MXU's int8 path doubles the
available OPS. These helpers drop into ``flax.linen.Dense(dot_general=)``
/ ``Conv(conv_general_dilated=)`` and quantize BOTH operands on the fly:

- activations: dynamic symmetric absmax, per-row for matmuls (the
  row scale factors out of the contraction exactly) and per-tensor for
  convs (a spatial window mixes rows, so only a whole-tensor scale
  commutes with the convolution);
- weights: per-output-channel absmax (the output channel never enters
  a contraction, so its scale also factors exactly).

The int8 dot accumulates in int32 and the two scales multiply the
result — the only losses vs the float path are the two roundings to
127 levels. Quantizing weights on the fly (instead of shipping a
pre-quantized tree like models/quant) keeps the param tree and every
checkpoint converter unchanged; the re-quantization pass is one read
of the weights per forward, negligible next to the activation matmuls
it accelerates.

No reference counterpart: the reference has no quantized inference
path at all (its serving story is fp16/bf16 torch — README.md:56-66);
this is a TPU-native production-serving addition. Accuracy is pinned
by tests/test_int8.py (bitwise agreement at power-of-two scales, logit
cosine + detection agreement at detector level).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quantize(x, axes, eps=1e-12):
    """Symmetric absmax int8 over ``axes``: (x8, scale) with
    x8 * scale ~= x; scale keeps reduced dims for broadcasting."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    x8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def quant_dot_general(lhs, rhs, dimension_numbers, precision=None,
                      preferred_element_type=None):
    """``lax.dot_general`` drop-in (flax Dense signature) computing the
    contraction in int8 with int32 accumulation.

    Supports the Dense pattern only: contract the last lhs axis with
    the first rhs axis, no batch axes. lhs scales are per row (all
    non-contracted axes), rhs scales per output column — both factor
    out of the contraction exactly, so
    ``dot(l8, r8) * (ls * rs) == dot(l8*ls, r8*rs)`` in exact
    arithmetic; the result is cast back to the lhs dtype.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if (tuple(lc), tuple(rc)) != ((lhs.ndim - 1,), (0,)) or lb or rb:
        raise NotImplementedError(
            f"quant_dot_general supports the Dense contraction only, "
            f"got {dimension_numbers}")
    dt = lhs.dtype
    l8, ls = _quantize(lhs, axes=-1)          # scale: (..., 1)
    r8, rs = _quantize(rhs, axes=0)           # scale: (1, N)
    y = jax.lax.dot_general(l8, r8, dimension_numbers,
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * ls * rs).astype(dt)


def quant_conv_general(lhs, rhs, window_strides, padding,
                       lhs_dilation=None, rhs_dilation=None,
                       dimension_numbers=None, feature_group_count=1,
                       batch_group_count=1, precision=None,
                       preferred_element_type=None):
    """``lax.conv_general_dilated`` drop-in (flax Conv signature, NHWC/
    HWIO) computing the convolution in int8 with int32 accumulation.

    Activation scale is per tensor (a scalar commutes with any linear
    op); weight scale is per output channel (HWIO axis -1, outside the
    contraction). Grouped/depthwise convs fall back to the float op:
    the 7x7 depthwise runs on the VPU where int8 buys nothing.
    """
    if feature_group_count != 1 or batch_group_count != 1:
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            batch_group_count=batch_group_count, precision=precision,
            preferred_element_type=preferred_element_type)
    dt = lhs.dtype
    l8, ls = _quantize(lhs, axes=tuple(range(lhs.ndim)))  # scalar
    r8, rs = _quantize(rhs, axes=(0, 1, 2))               # (1,1,1,O)
    y = jax.lax.conv_general_dilated(
        l8, r8, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * ls
            * rs.reshape((1,) * (y.ndim - 1) + (-1,))).astype(dt)
