"""Autoregressive text generation for WeDetect-Ref (chat/captioning).

Behavioral spec: reference wedetect_ref/models/qwen3vl_grounding.py:
311-379 — Qwen3VLGroundingForConditionalGeneration extends the HF
Qwen3VLForConditionalGeneration (untied lm_head Linear) and inherits
``.generate()``; the reference uses this class for the stage-1/2 SFT
twin, so a trained checkpoint can caption/chat as well as ground.

TPU design: ONE jitted call — a batched prefill through the grounding
trunk (image pos embeds + deepstack + optional object features, i.e.
the exact same forward the model was trained with) followed by a
``lax.scan`` greedy/temperature decode over a PREALLOCATED KV cache.
All shapes are static: prompt length, cache capacity (P + max_new) and
step count are compile-time constants, and per-row prompt lengths are
handled by the attention mask + per-row write offsets, so one compile
serves a whole right-padded batch. The single-token decode layers are
pure-jnp twins of nn/qwen3vl.TextLayer reading the SAME param tree
(the attention itself reuses ops/attention.gqa_attention, so decode
numerics match prefill numerics — pinned by the greedy-vs-joint
teacher-forcing test in tests/test_ref_generate.py).
"""

from __future__ import annotations

import functools
import math


import jax
import jax.numpy as jnp

from wedetect_tpu.models.quant import matmul_any
from wedetect_tpu.nn.qwen3vl import (RefCfg, _apply_rope,
                                     interleaved_mrope_cos_sin)
from wedetect_tpu.ops.attention import gqa_attention


def _rms(x, scale, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * scale).astype(x.dtype)


def _lm_logits(params, hidden):
    """LM head: untied ['lm_head']['kernel'] when present (the
    reference class adds an untied Linear), else the tied input
    embedding — same contract as train/ref_lm."""
    h = hidden.astype(jnp.float32)
    if "lm_head" in params:
        return matmul_any(h, params["lm_head"], jnp.float32)
    emb = params["embed"]["embed_tokens"]["embedding"]
    return h @ emb.T.astype(jnp.float32)


def _decode_layer(p, cfg, x, cos, sin, cache_k, cache_v, write_at,
                  kv_valid):
    """One decoder layer for a single-token step.

    x (B, 1, D); cache_k/v (B, C, KVH, HD) — this step's post-rope KV
    is written at column ``write_at`` (same for every row: decode is
    lockstep over the right-padded batch) and the query attends the
    whole cache under ``kv_valid`` (B, C). Pure-jnp twin of
    nn/qwen3vl.TextLayer reading its exact param tree."""
    c = cfg
    b = x.shape[0]
    eps = c.rms_eps
    dt = x.dtype      # compute dtype (flax Dense(dtype=...) semantics:
    #                   params are cast to the compute dtype)
    y = _rms(x, p["input_ln"]["scale"], eps)
    q = matmul_any(y, p["q_proj"], dt)
    k = matmul_any(y, p["k_proj"], dt)
    v = matmul_any(y, p["v_proj"], dt)
    q = _rms(q.reshape(b, 1, c.heads, c.head_dim),
             p["q_norm"]["scale"], eps)
    k = _rms(k.reshape(b, 1, c.kv_heads, c.head_dim),
             p["k_norm"]["scale"], eps)
    v = v.reshape(b, 1, c.kv_heads, c.head_dim)
    q, k = _apply_rope(q, k, cos[:, :, None, :], sin[:, :, None, :])
    cache_k = jax.lax.dynamic_update_slice(
        cache_k, k.astype(cache_k.dtype), (0, write_at, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, v.astype(cache_v.dtype), (0, write_at, 0, 0))
    o = gqa_attention(q, cache_k, cache_v, causal=False,
                      kv_valid=kv_valid,
                      sm_scale=1.0 / math.sqrt(c.head_dim),
                      impl="einsum")
    x = x + matmul_any(o.astype(dt).reshape(b, 1, -1), p["o_proj"], dt)
    y = _rms(x, p["post_ln"]["scale"], eps)
    gate = matmul_any(y, p["gate_proj"], dt)
    up = matmul_any(y, p["up_proj"], dt)
    return x + matmul_any(jax.nn.silu(gate) * up, p["down_proj"], dt), \
        cache_k, cache_v


def _sample(logits, temperature, rng):
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        rng, logits / temperature, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnums=(0, 1, 2, 8, 12, 13, 14, 15, 18, 20))
def ref_generate(cfg: RefCfg, grid_h: int, grid_w: int, params,
                 patches, input_ids, attn_mask, position_ids,
                 visual_start: int, next_pos, boxes_xyxy, ori_wh,
                 max_new_tokens: int, eos_id: int,
                 temperature: float = 0.0,
                 pad_id: int = 0,
                 object_positions=None, rng=None,
                 dtype=jnp.float32, decode_params=None,
                 grid_t: int = 1):
    """Greedy / temperature generation from image-bearing prompts.

    patches (S, Dp) one shared image; input_ids/attn_mask (B, P)
    right-padded prompts; position_ids (3, B, P) MRoPE ids; next_pos
    (B,) int32 — each row's first generated-token position (text
    positions: all three MRoPE axes equal); boxes_xyxy (N, 4) +
    object_positions (B, N) optionally thread grounding <object>
    features into the prompt (None = caption-only: pass a dummy box,
    reference qwen3vl_grounding.py:168-171 does the same). Returns
    (B, max_new_tokens) int32 — eos is emitted, positions after it
    hold pad_id. decode_params optionally substitutes the param tree
    read by the per-token decode layers + LM head — pass
    models/quant.quantize_decode_params(params) for weight-only-int8
    decode (prefill stays full precision; see models/quant docstring).
    grid_t > 1 feeds a VIDEO prompt: patches hold grid_t temporal
    groups, the prompt's vision span is grid_t*mh*mw video tokens and
    position_ids come from get_rope_index_single_video (the same
    contiguous-span layout train/ref_lm.ref_lm_step trains on).
    """
    from wedetect_tpu.models.ref import RefModules

    c = cfg
    b, p_len = input_ids.shape
    if object_positions is None:
        object_positions = jnp.full((b, 1), -1, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    mod = RefModules(c, grid_h, grid_w, dtype=dtype, grid_t=grid_t)
    hidden, kvs = mod.apply(
        {"params": params}, patches, input_ids, attn_mask,
        position_ids, boxes_xyxy, ori_wh, visual_start,
        object_positions, method=_prefill_hidden_kvs)
    dp = params if decode_params is None else decode_params
    return _decode_from_prefill(c, dp, hidden, kvs, attn_mask,
                                next_pos, max_new_tokens, eos_id,
                                temperature, pad_id, rng, dtype)


@functools.partial(
    jax.jit,
    static_argnums=(0, 1, 9, 11, 12, 13, 14, 17))
def ref_generate_multi(cfg: RefCfg, grids, params, patches_list,
                       input_ids, attn_mask, position_ids,
                       boxes_list, ori_wh_list, visual_starts,
                       next_pos, max_new_tokens: int, eos_id: int,
                       temperature: float = 0.0, pad_id: int = 0,
                       object_positions=None, rng=None,
                       dtype=jnp.float32, decode_params=None):
    """ref_generate for prompts holding SEVERAL images (static
    per-image grids + span offsets, arguments as in
    models/ref.ref_score_step_multi). boxes_list entries may be None;
    object_positions=None for caption-only prompts; decode_params as
    in ref_generate (weight-only-int8 decode tree)."""
    from wedetect_tpu.models.ref import RefModules

    c = cfg
    b = input_ids.shape[0]
    if object_positions is None:
        object_positions = jnp.full((b, 1), -1, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    mod = RefModules(c, grids[0][0], grids[0][1], dtype=dtype)
    hidden, kvs = mod.apply(
        {"params": params}, tuple(patches_list), tuple(grids),
        input_ids, attn_mask, position_ids, tuple(boxes_list),
        tuple(ori_wh_list), tuple(visual_starts), object_positions,
        method=_prefill_hidden_kvs_multi)
    dp = params if decode_params is None else decode_params
    return _decode_from_prefill(c, dp, hidden, kvs, attn_mask,
                                next_pos, max_new_tokens, eos_id,
                                temperature, pad_id, rng, dtype)


def _decode_from_prefill(c, params, hidden, kvs, attn_mask, next_pos,
                         max_new_tokens, eos_id, temperature, pad_id,
                         rng, dtype):
    """Shared decode: sample the first token at each row's last real
    prompt position, then lax.scan single-token steps over the
    preallocated KV cache."""
    from wedetect_tpu.models.quant import prepare_decode_params

    params = prepare_decode_params(params)   # int4: unpack to s4 once
    b, p_len = attn_mask.shape
    last = jnp.sum(attn_mask, axis=1).astype(jnp.int32) - 1   # (B,)
    h_last = jnp.take_along_axis(
        hidden, last[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits0 = _lm_logits(params, h_last)
    rng, r0 = jax.random.split(rng)
    tok0 = _sample(logits0, temperature, r0)

    # preallocate caches (B, P + max_new, KVH, HD)
    caches = []
    for (k, v) in kvs:
        kc = jnp.concatenate(
            [jnp.broadcast_to(k, (b,) + k.shape[1:]),
             jnp.zeros((b, max_new_tokens) + k.shape[2:], k.dtype)],
            axis=1)
        vc = jnp.concatenate(
            [jnp.broadcast_to(v, (b,) + v.shape[1:]),
             jnp.zeros((b, max_new_tokens) + v.shape[2:], v.dtype)],
            axis=1)
        caches.append((kc, vc))

    tp = params["text"]
    emb_p = params["embed"]

    def body(carry, t):
        tok, done, caches, rng = carry
        emitted = jnp.where(done, pad_id, tok)
        done = done | (tok == eos_id)
        x = emb_p["embed_tokens"]["embedding"][tok][:, None, :]
        x = x.astype(dtype)
        posr = (next_pos + t).astype(jnp.int32)            # (B,)
        pos3 = jnp.broadcast_to(posr[None, :, None], (3, b, 1))
        cos, sin = interleaved_mrope_cos_sin(pos3, c.text)
        kv_valid = jnp.concatenate(
            [attn_mask.astype(jnp.int32),
             jnp.broadcast_to(
                 (jnp.arange(max_new_tokens) <= t).astype(jnp.int32),
                 (b, max_new_tokens))], axis=1)
        new_caches = []
        for i in range(c.text.layers):
            kc, vc = caches[i]
            x, kc, vc = _decode_layer(
                tp[f"layer{i}"], c.text, x, cos, sin, kc, vc,
                p_len + t, kv_valid)
            new_caches.append((kc, vc))
        h = _rms(x, tp["norm"]["scale"], c.text.rms_eps)[:, 0]
        logits = _lm_logits(params, h)
        rng, r = jax.random.split(rng)
        nxt = _sample(logits, temperature, r)
        nxt = jnp.where(done, tok, nxt)   # frozen rows stay put
        return (nxt, done, new_caches, rng), emitted

    done0 = jnp.zeros((b,), bool)
    (_, _, _, _), toks = jax.lax.scan(
        body, (tok0, done0, caches, rng),
        jnp.arange(max_new_tokens, dtype=jnp.int32))
    return toks.T                                    # (B, max_new)


def _prefill_hidden_kvs_multi(mod, patches_list, grids, input_ids,
                              attn_mask, position_ids, boxes_list,
                              ori_wh_list, visual_starts,
                              object_positions):
    """Multi-image twin of _prefill_hidden_kvs: score_multi's
    embedding assembly + prefix_pass(return_hidden=True)."""
    tokens, ds, obj = mod._multi_assembly(
        patches_list, grids, boxes_list, ori_wh_list)
    x = mod.embed(input_ids)
    b = x.shape[0]
    for tok, vs in zip(tokens, visual_starts):
        x = jax.lax.dynamic_update_slice_in_dim(
            x, jnp.broadcast_to(tok[None].astype(x.dtype),
                                (b,) + tok.shape), vs, axis=1)
    x = mod._scatter_objects(x, obj, object_positions)
    kvs, hidden = mod.text.prefix_pass(
        x, position_ids, attn_mask, deepstack_embeds=ds,
        visual_start=tuple(visual_starts), return_hidden=True)
    return hidden, kvs


def _prefill_hidden_kvs(mod, patches, input_ids, attn_mask,
                        position_ids, boxes_xyxy, ori_wh,
                        visual_start, object_positions):
    """RefModules method: the grounding prefill — RefModules'
    standard vision/RoI assembly (incl. the raw-uint8-pixels guard
    that device_patchify relies on), then
    prefix_pass(return_hidden=True) for BOTH the final normed hidden
    states and the per-layer post-rope KV for the decode cache."""
    img_tokens, obj, taps = mod._vision_and_objects(
        patches, boxes_xyxy, ori_wh)
    x = mod.embed(input_ids)
    b = x.shape[0]
    x = jax.lax.dynamic_update_slice_in_dim(
        x, jnp.broadcast_to(img_tokens[None].astype(x.dtype),
                            (b,) + img_tokens.shape),
        visual_start, axis=1)
    x = mod._scatter_objects(x, obj, object_positions)
    kvs, hidden = mod.text.prefix_pass(
        x, position_ids, attn_mask, deepstack_embeds=list(taps),
        visual_start=visual_start, return_hidden=True)
    return hidden, kvs
