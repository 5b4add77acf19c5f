"""Calibration statistics for weight-only int4 decode quantization.

quantize_weight4's activation-weighted fit (models/quant) needs, for
every quantized matmul, the RMS of that matmul's INPUT activation per
contraction channel. This module collects them by replaying the text
decoder over real prompts in plain jnp — the same sequence-wide math
as nn/qwen3vl.TextLayer (and the exact twin of models/ref_generate's
per-token ``_decode_layer``), with a masked per-channel sum-of-squares
recorded at each of the seven matmul inputs plus the LM head:

- q/k/v_proj read the input_ln output,
- o_proj the attention output,
- gate/up_proj the post_ln output,
- down_proj ``silu(gate) * up``,
- lm_head the final normed hidden states.

The prefill hidden-state distribution stands in for the decode-time
single-token distribution (same trunk, same layers — the standard
weight-only-PTQ calibration shortcut). Statistics are accumulated as
(sum_sq (H,), token count) across batches on the host, so any number
of calibration prompts stream through one jitted collector per
(grid, seq) shape.

No reference counterpart: the reference serves generation through HF
``.generate()`` at full precision (wedetect_ref/models/
qwen3vl_grounding.py:311-379) and ships no quantization at all.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

from wedetect_tpu.models.ref_generate import _rms
from wedetect_tpu.nn.qwen3vl import (_apply_rope,
                                     interleaved_mrope_cos_sin)
from wedetect_tpu.ops.attention import gqa_attention


def _calib_assembly(mod, patches, input_ids, boxes_xyxy, ori_wh,
                    visual_start, object_positions):
    """RefModules method: the grounding prefill's embedding assembly
    (vision tower + image-token scatter + object scatter), stopping
    BEFORE the decoder so the collector can replay the layers with
    stats taps. Returns (inputs_embeds, deepstack taps)."""
    img_tokens, obj, taps = mod._vision_and_objects(
        patches, boxes_xyxy, ori_wh)
    x = mod.embed(input_ids)
    b = x.shape[0]
    x = jax.lax.dynamic_update_slice_in_dim(
        x, jnp.broadcast_to(img_tokens[None].astype(x.dtype),
                            (b,) + img_tokens.shape),
        visual_start, axis=1)
    x = mod._scatter_objects(x, obj, object_positions)
    return x, list(taps)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 8))
def collect_batch(cfg, grid_h: int, grid_w: int, params, patches,
                  input_ids, attn_mask, position_ids,
                  visual_start: int, boxes_xyxy, ori_wh,
                  object_positions=None):
    """One calibration batch -> per-matmul (sum_sq (H,)) + token count.

    Arguments mirror models/ref_generate.ref_generate's prefill
    (right-padded (B, P) prompts over one shared image grid); pad slots
    are masked out of the statistics. Returns
    ``({"text": {"layer{i}": {matmul: ss}}, "lm_head": ss}, count)``.
    """
    from wedetect_tpu.models.ref import RefModules

    c = cfg.text
    b, p_len = input_ids.shape
    if object_positions is None:
        object_positions = jnp.full((b, 1), -1, jnp.int32)
    mod = RefModules(cfg, grid_h, grid_w)
    x, taps = mod.apply(
        {"params": params}, patches, input_ids, boxes_xyxy, ori_wh,
        visual_start, object_positions, method=_calib_assembly)

    cos, sin = interleaved_mrope_cos_sin(position_ids, c)
    kv_valid = attn_mask.astype(jnp.int32)
    valid = attn_mask.astype(jnp.float32)[..., None]      # (B, P, 1)
    count = jnp.sum(valid)

    def ss(y):
        return jnp.sum(jnp.square(y.astype(jnp.float32)) * valid,
                       axis=(0, 1))

    tp = params["text"]
    stats = {}
    for i in range(c.layers):
        p = tp[f"layer{i}"]
        ls = {}
        y = _rms(x, p["input_ln"]["scale"], c.rms_eps)
        qkv_ss = ss(y)
        ls["q_proj"] = ls["k_proj"] = ls["v_proj"] = qkv_ss
        q = y @ p["q_proj"]["kernel"]
        k = y @ p["k_proj"]["kernel"]
        v = y @ p["v_proj"]["kernel"]
        q = _rms(q.reshape(b, p_len, c.heads, c.head_dim),
                 p["q_norm"]["scale"], c.rms_eps)
        k = _rms(k.reshape(b, p_len, c.kv_heads, c.head_dim),
                 p["k_norm"]["scale"], c.rms_eps)
        v = v.reshape(b, p_len, c.kv_heads, c.head_dim)
        q, k = _apply_rope(q, k, cos[:, :, None, :], sin[:, :, None, :])
        o = gqa_attention(q, k, v, causal=True, kv_valid=kv_valid,
                          sm_scale=1.0 / math.sqrt(c.head_dim),
                          impl="einsum").reshape(b, p_len, -1)
        ls["o_proj"] = ss(o)
        x = x + o @ p["o_proj"]["kernel"]
        y = _rms(x, p["post_ln"]["scale"], c.rms_eps)
        ls["gate_proj"] = ls["up_proj"] = ss(y)
        h = jax.nn.silu(y @ p["gate_proj"]["kernel"]) \
            * (y @ p["up_proj"]["kernel"])
        ls["down_proj"] = ss(h)
        x = x + h @ p["down_proj"]["kernel"]
        if i < len(taps):                           # deepstack taps
            tap = taps[i]
            span = jax.lax.dynamic_slice_in_dim(
                x, visual_start, tap.shape[0], axis=1)
            x = jax.lax.dynamic_update_slice_in_dim(
                x, span + tap[None].astype(x.dtype), visual_start,
                axis=1)
        stats[f"layer{i}"] = ls
    hidden = _rms(x, tp["norm"]["scale"], c.rms_eps)
    return {"text": stats, "lm_head": ss(hidden)}, count


def calibrate_decode_acts(cfg, params, batches):
    """Accumulate collect_batch over an iterable of calibration
    batches and finalize to the per-matmul activation-RMS tree that
    quantize_decode_params(bits=4, calib=...) consumes.

    ``batches``: iterable of dicts with keys grid_h, grid_w, patches,
    input_ids, attn_mask, position_ids, visual_start, boxes_xyxy,
    ori_wh (and optionally object_positions) — the ref_generate
    prefill layout; grids may differ per batch (one collector compile
    per distinct (grid, seq) shape)."""
    acc, total = None, 0.0
    for bt in batches:
        stats, count = collect_batch(
            cfg, int(bt["grid_h"]), int(bt["grid_w"]), params,
            jnp.asarray(bt["patches"]), jnp.asarray(bt["input_ids"]),
            jnp.asarray(bt["attn_mask"]),
            jnp.asarray(bt["position_ids"]), int(bt["visual_start"]),
            jnp.asarray(bt["boxes_xyxy"]), jnp.asarray(bt["ori_wh"]),
            jnp.asarray(bt["object_positions"])
            if "object_positions" in bt else None)
        stats = jax.tree.map(lambda a: np.asarray(a, np.float64), stats)
        total += float(count)
        acc = stats if acc is None else jax.tree.map(
            lambda a, s: a + s, acc, stats)
    assert acc is not None and total > 0, "no calibration tokens"
    return jax.tree.map(
        lambda a: np.sqrt(a / total).astype(np.float32), acc)
