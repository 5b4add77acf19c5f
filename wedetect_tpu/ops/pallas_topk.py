"""Pallas row-top-T kernel: the LVIS-scale candidate-selection fast
path.

Problem (measured on one v5e chip, PERF.md "LVIS-scale top-k"): the
detector's pre-NMS selection takes the top nms_pre=30000 of
N = A*K = 10.75M (anchor, class) scores. Every generic formulation is
gather/scatter-bound on TPU:
  lax.top_k (full sort)             278 ms
  bit-bisection + cumsum/searchsorted compaction  124 ms
    (the 31-step threshold bisection is only 20 ms; the ~5.8M random
     gathers of searchsorted-based compaction are ~100 ms)
  sorted scatter-max compaction     775 ms
  approx_max_k(recall=1.0)          136 ms (recall<1 is inexact)

Fix (sparse regime): when every anchor has <= T candidates above
score_thr — the real-checkpoint regime — extract the top-T classes
PER ANCHOR with a VPU-resident iterative-max kernel (structured
access only, no gathers), then run lax.top_k over the (A*T = 537k)-
candidate remainder: ~32 ms, exact by construction. The caller
(ops/nms.py _batched_select_topk) checks the density in one pass and
routes dense score tensors (per-anchor-correlated scores, where hot
anchors hold hundreds of the global top-k) to the bisection +
ranked-extraction path instead. Full measurements: PERF.md
"LVIS-scale top-k".

Tie semantics match the flat lax.top_k order exactly on the fast
path: within an anchor, equal values extract in ascending class
order; across anchors, lax.top_k prefers lower flat (anchor-major)
index.

Reference behavior being accelerated: mmdet filter_scores_and_topk
(yolo_world_head.py predict_by_feat nms_pre), score_thr masking
included.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_topk_kernel(t: int, x_ref, vals_ref, cls_ref):
    """Extract the top-t (value, class) per row by iterative max.

    x_ref: (RB, K) f32 scores (-inf for masked lanes).
    vals_ref: (RB, t) f32; cls_ref: (RB, t) int32.

    Mosaic note: dynamic lane-dim stores are not allowed, so the
    per-iteration (value, class) columns accumulate into loop-carried
    (RB, t) arrays via a one-hot select (pure VPU ops) and are written
    once at the end.
    """
    rb, k = x_ref.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (rb, k), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (rb, t), 1)

    def body(i, carry):
        x, vals, cls = carry
        m = jnp.max(x, axis=1, keepdims=True)              # (RB, 1)
        # first occurrence of the max -> ascending-class tie order
        am = jnp.min(jnp.where(x == m, iota, k), axis=1,
                     keepdims=True)                        # (RB, 1)
        vals = jnp.where(slot == i, m, vals)
        cls = jnp.where(slot == i, am, cls)
        x = jnp.where(iota == am, -jnp.inf, x)
        return x, vals, cls

    _, vals, cls = jax.lax.fori_loop(
        0, t, body,
        (x_ref[:].astype(jnp.float32),
         jnp.full((rb, t), -jnp.inf, jnp.float32),
         jnp.zeros((rb, t), jnp.int32)))
    vals_ref[:] = vals
    cls_ref[:] = cls


def row_topk(scores: jax.Array, t: int, row_block: int = 240,
             interpret: bool | None = None):
    """scores (R, K) f32 -> (vals (R, t) f32 desc, cls (R, t) i32).

    R must be divisible by row_block. interpret defaults to True off
    TPU (CPU tests), False on TPU.
    """
    r, k = scores.shape
    assert r % row_block == 0, (r, row_block)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    grid = (r // row_block,)
    return pl.pallas_call(
        functools.partial(_row_topk_kernel, t),
        grid=grid,
        in_specs=[pl.BlockSpec((row_block, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((row_block, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, t), jnp.float32),
            jax.ShapeDtypeStruct((r, t), jnp.int32),
        ],
        interpret=interpret,
    )(scores)
