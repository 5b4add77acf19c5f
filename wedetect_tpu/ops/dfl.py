"""Distribution Focal Loss (DFL) expectation decode.

The head's regression branch emits 4*reg_max logits per anchor; the box
distance along each side is the expectation of softmax(logits) against
proj = [0, 1, ..., reg_max-1] (reference:
wedetect/models/dense_heads/yolo_world_head.py:280-289).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dfl_expectation(dist_logits: jax.Array, reg_max: int = 16) -> jax.Array:
    """(..., 4*reg_max) logits -> (..., 4) expected distances.

    The channel layout follows the reference reshape
    `[-1, 4, reg_max, h*w]` of an NCHW (4*reg_max, H, W) tensor: the
    4*reg_max channels factor as (side, bin), i.e. the first reg_max
    channels are the bins of the first side.
    """
    shape = dist_logits.shape[:-1] + (4, reg_max)
    logits = dist_logits.reshape(shape)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("...sb,b->...s", probs, proj)
