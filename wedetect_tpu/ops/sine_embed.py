"""Sine position embeddings for boxes and image grids.

Behavioral spec: reference
wedetect_ref/models/qwen3vl_referring.py:13-50
(gen_sineembed_for_position / box_xyxy_to_cxcywh): per coordinate c,
dim_t[i] = 10000^(2*(i//2)/dim) with dim = embed_dim // n_coords;
pos = c*2pi / dim_t; output interleaves sin(pos[0::2]) and
cos(pos[1::2]) pairwise, concatenated per coordinate in order
(y, x[, w, h]).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def box_xyxy_to_cxcywh(boxes: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = (boxes[..., i] for i in range(4))
    return jnp.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0],
                     axis=-1)


def _coord_embed(c: jax.Array, dim: int) -> jax.Array:
    """c (N,) -> (N, dim) interleaved sin/cos."""
    i = jnp.arange(dim, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(i / 2.0) / dim)
    pos = (c[:, None].astype(jnp.float32) * (2.0 * math.pi)) / dim_t
    # stack(sin(pos[0::2]), cos(pos[1::2])) pairwise then flatten
    return jnp.stack([jnp.sin(pos[:, 0::2]), jnp.cos(pos[:, 1::2])],
                     axis=2).reshape(c.shape[0], -1)


def sine_embed(pos: jax.Array, embed_dim: int) -> jax.Array:
    """pos (N, 2) as (x, y) or (N, 4) as (cx, cy, w, h) -> (N, embed_dim).

    Output coordinate order is (y, x) / (y, x, w, h), matching
    gen_sineembed_for_position.
    """
    n_coords = pos.shape[-1]
    dim = embed_dim // n_coords
    x = _coord_embed(pos[:, 0], dim)
    y = _coord_embed(pos[:, 1], dim)
    if n_coords == 2:
        return jnp.concatenate([y, x], axis=-1)
    w = _coord_embed(pos[:, 2], dim)
    h = _coord_embed(pos[:, 3], dim)
    return jnp.concatenate([y, x, w, h], axis=-1)
