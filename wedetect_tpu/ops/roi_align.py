"""RoIAlign as a gather-based bilinear kernel (NHWC, jit-safe).

TPU-native replacement for the torchvision.ops.roi_align CUDA op the
reference uses (reference:
wedetect_ref/models/qwen3vl_referring.py:220-222 — 7x7 output,
spatial_scale 1/8, 1/16, 1/32, default sampling_ratio=-1 and
aligned=False).

Semantics (published RoIAlign algorithm, Mask R-CNN):
- roi coords scaled by spatial_scale; aligned=False keeps the
  half-pixel offset (no -0.5 shift)
- sampling_ratio > 0: each output bin averages ratio^2 bilinear
  samples at fixed sub-positions
- sampling_ratio <= 0 (torch's adaptive default): the per-roi grid is
  ceil(roi_size/out_size) samples per bin axis. Data-dependent counts
  can't change array shapes under jit, so every roi gathers a static
  max_ratio x max_ratio sample grid whose POSITIONS are computed from
  the dynamic per-roi count g and whose weights mask samples j >= g
  (weight (j < g)/g). Bit-exact vs torch for every roi with
  g <= max_ratio; larger rois fall back to max_ratio uniform samples
  per bin — a denser quadrature of the same bin integral (error
  O(1/g^2), far below bf16 resolution for smooth feature maps).
- bilinear samples outside the feature map are zero; samples with
  y/x < -1 or > size are dropped (zero), edge-clamped inside [-1, size]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(feat: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """feat (H, W, C); y/x (...,) sample coords -> (..., C)."""
    h, w, _ = feat.shape
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0).astype(feat.dtype)[..., None]
    lx = (x - x0).astype(feat.dtype)[..., None]
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = ((1 - ly) * (1 - lx) * v00 + (1 - ly) * lx * v01
           + ly * (1 - lx) * v10 + ly * lx * v11)
    return jnp.where(oob[..., None], 0.0, out)


def roi_align(feat: jax.Array, rois: jax.Array, out_size: int = 7,
              spatial_scale: float = 1.0,
              sampling_ratio: int = -1,
              max_ratio: int = 8) -> jax.Array:
    """feat (H, W, C); rois (N, 4) xyxy in input coords ->
    (N, out_size, out_size, C).

    sampling_ratio <= 0 selects torch's adaptive per-roi grid (see
    module docstring); max_ratio bounds the static sample budget.
    """
    s = sampling_ratio if sampling_ratio > 0 else max_ratio
    rois = rois.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    # aligned=False: torch clamps roi size at >= 1
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)
    bw = rw / out_size
    bh = rh / out_size

    if sampling_ratio > 0:
        gy = jnp.full_like(rh, s)
        gx = jnp.full_like(rw, s)
    else:
        gy = jnp.clip(jnp.ceil(rh / out_size), 1.0, s)
        gx = jnp.clip(jnp.ceil(rw / out_size), 1.0, s)

    j = jnp.arange(s, dtype=jnp.float32)
    off_y = (j[None, :] + 0.5) / gy[:, None]          # (N, s) bin units
    off_x = (j[None, :] + 0.5) / gx[:, None]
    wy = jnp.where(j[None, :] < gy[:, None], 1.0 / gy[:, None], 0.0)
    wx = jnp.where(j[None, :] < gx[:, None], 1.0 / gx[:, None], 0.0)
    bins = jnp.arange(out_size, dtype=jnp.float32)
    # (N, out, s) absolute sample coords
    ys = (y1[:, None, None]
          + bh[:, None, None] * (bins[None, :, None] + off_y[:, None, :]))
    xs = (x1[:, None, None]
          + bw[:, None, None] * (bins[None, :, None] + off_x[:, None, :]))

    def one(ys, xs, wy, wx):
        o = out_size
        yy = jnp.broadcast_to(ys.reshape(o, s, 1, 1), (o, s, o, s))
        xx = jnp.broadcast_to(xs.reshape(1, 1, o, s), (o, s, o, s))
        v = _bilinear(feat, yy.reshape(-1), xx.reshape(-1))
        v = v.reshape(o, s, o, s, -1)
        return jnp.einsum("isjtc,s,t->ijc", v,
                          wy.astype(v.dtype), wx.astype(v.dtype))

    return jax.vmap(one)(ys, xs, wy, wx)
