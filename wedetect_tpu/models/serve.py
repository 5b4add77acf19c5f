"""Continuous-batching generation engine for WeDetect-Ref serving.

The reference has no serving loop at all — its stage-1/2 twin inherits
HF ``.generate()`` (wedetect_ref/models/qwen3vl_grounding.py:311-379),
which decodes one static batch to completion: a finished row keeps
burning decode steps until the LONGEST row in the batch finishes, and
new requests wait for the whole batch. This module is the production
upgrade for TPU serving: a fixed pool of decode SLOTS over one shared
preallocated KV cache, where each finished row is refilled with the
next queued request while the other rows keep decoding.

TPU design (everything static-shaped, two compiled programs total):

- ``_admit``: single-prompt prefill (the exact grounding trunk forward
  from models/ref_generate, flash attention on the padded prompt
  bucket) whose post-rope KV is written into one slot's rows of the
  shared (SLOTS, P+G, KVH, HD) cache with a *traced* slot index — one
  compile serves every slot.
- ``_decode_chunk``: ``lax.scan`` over T single-token steps for ALL
  slots in lockstep. Unlike models/ref_generate's lockstep decode,
  rows are at DIFFERENT depths: each row writes its KV at its own
  column (P + gen_count[row], a per-row scatter) and attends under a
  per-row validity mask, so freshly admitted rows coexist with rows
  that are 500 tokens deep. Chunking amortizes the host dispatch
  round-trip (30+ ms on tunneled transports — PERF.md "Transport
  sensitivity") over T tokens; admission happens at chunk boundaries,
  so a slot that finishes mid-chunk idles at most T-1 steps.

Both programs donate the engine state, so the multi-GB KV cache is
updated in place instead of being copied every chunk.

``kv_bits=8`` stores the cache as int8 codes + one f32 absmax scale
per written (token, kv-head) vector — ~0.52x the bf16 pool's HBM
footprint AND decode-step KV read traffic, which matters exactly
where the long prompt buckets do (an 8-slot 2B P=2048 pool drops
2.0 -> ~1.05 GB; at int8 WEIGHTS + P=2048 the KV is ~45% of the
decode step's HBM bytes). The attention folds the scales EXACTLY
(``q . (k8 s) == (q . k8) s`` on the logits, ``p . (v8 s) == (p s)
. v8`` on the output — ``_gqa_int8kv``), so the dots stream pure
int8 and the only approximation is the 8-bit code itself; it is
lossy the way weight-only int8 is, opt-in, and gated per deployment
like int4 weights (cli/quant_gate philosophy).

Greedy by default; ``temperature > 0`` samples (with optional top-k /
top-p warps) with PER-REQUEST reproducible streams: generated token i
of a request with seed s is
``categorical(fold_in(PRNGKey(s), i), warp(logits) / T)`` (see
``_sample_rows``), so a request's tokens do not depend on the slot it
landed in, the chunk size, the admission order, or what else shares
the batch — unlike HF ``.generate``'s shared-generator sampling, a
rerun of one request reproduces exactly. Decode numerics are the
models/ref_generate ones (same param tree, same
ops/attention.gqa_attention) — tests/test_serve.py pins token-exact
agreement with ``ref_generate`` per request (greedy) and
scheduling-invariance of the sampled streams.

Piggyback (chunked) prefill (``piggyback=True``): the b=8 decode step
is HBM-bound — every step streams the full decoder weight set for 8
token rows, leaving the MXU mostly idle — while the 384-token
admission prefill is the same weight stream with 384 rows. So instead
of running admission as a separate compute-bound program (~13 ms of
decoder FLOPs per admit, 20% of the serving wall clock — PERF.md
round-4 gap accounting), the prompt rides the decode chunk:
``_encode_prompt`` (vision tower + embedding assembly only, the
genuinely compute-bound ~half of admission) runs once per request,
then ``_decode_chunk_pb`` appends F = ceil(P/chunk) prompt rows to
every decode step. The QKV/MLP matmuls run on B+F rows sharing ONE
weight read (the prompt rows are ~free at these arithmetic
intensities), the segment's post-rope KV is scattered into the
admitted slot's prompt columns, and per-row validity masks give exact
causal semantics. The admitted slot activates at the END of the chunk
(first sampled token parked in cur_tok, emitted next chunk — the same
stream the classic ``_admit`` path produces). One admission per chunk;
extra free slots fall back to the classic admit (startup fill,
completion bursts).
"""

from __future__ import annotations

import functools
import math
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from wedetect_tpu.models.quant import matmul_any, prepare_decode_params
from wedetect_tpu.models.ref_generate import (_lm_logits,
                                              _prefill_hidden_kvs, _rms)
from wedetect_tpu.nn.qwen3vl import (RefCfg, _apply_rope,
                                     interleaved_mrope_cos_sin)
from wedetect_tpu.ops.attention import gqa_attention

# Engine state pytree (donated through both jitted programs):
#   caches:      tuple per layer of (k, v), each (B, P+G, KVH, HD)
#   prompt_mask: (B, P) int32 — each slot's prompt validity row
#   gen_count:   (B,)   int32 — tokens generated so far per slot
#   next_pos:    (B,)   int32 — next MRoPE position per slot
#   cur_tok:     (B,)   int32 — next token to FEED (already emitted)
#   done:        (B,)   bool  — row hit eos / slot is empty
#   seeds:       (B,)   int32 — per-request sampling seed (T > 0)
#   caps:        (B,)   int32 — per-request generation cap (<= G): the
#                row goes done once gen_count reaches it, so a request
#                asking for 2 tokens frees its slot after 2 steps
#                instead of occupying it to the pool-wide G


def _sample_rows(logits, sampling, seeds, idx):
    """Per-row sampling with scheduling-invariant streams: generated
    token ``idx[r]`` of the request with seed ``seeds[r]`` is
    ``categorical(fold_in(PRNGKey(seed), idx), warp(logits) / T)`` — a
    pure function of (seed, token index), so the stream does not depend
    on the slot the request landed in, the chunk size, the admission
    order, or what else shares the batch (pinned in tests/test_serve).

    ``sampling`` is the static (temperature, top_k, top_p) triple:
    temperature == 0.0 is greedy argmax (seeds unused); top_k > 0
    keeps the k highest logits; top_p < 1.0 keeps the smallest
    descending-probability prefix with cumulative mass >= top_p
    (always >= 1 token; logit ties at the cut are all kept). Warps
    compose top_k-then-top_p, matching the HF LogitsProcessor order
    the reference twin inherits via ``.generate``
    (/root/reference/wedetect_ref/models/qwen3vl_grounding.py:311-379
    never overrides it), but with per-request reproducible streams."""
    temperature, top_k, top_p = sampling
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def one(lg, s, i):
        lg = lg.astype(jnp.float32) / temperature
        if top_k > 0:
            vals = jax.lax.top_k(lg, top_k)[0]
            lg = jnp.where(lg < vals[-1], -jnp.inf, lg)
        if top_p < 1.0:
            srt = -jnp.sort(-lg)                     # descending
            p = jax.nn.softmax(srt)
            cum_prev = jnp.cumsum(p) - p             # mass above rank
            n_keep = jnp.sum(cum_prev < top_p)       # >= 1
            lg = jnp.where(lg < srt[n_keep - 1], -jnp.inf, lg)
        k = jax.random.fold_in(jax.random.PRNGKey(s), i)
        return jax.random.categorical(k, lg, axis=-1)

    return jax.vmap(one)(logits, seeds, idx).astype(jnp.int32)


def _kv_quant(x):
    """Post-rope K or V values -> (int8 codes, per-(..., head) absmax
    scale): symmetric per-token-per-head int8 over the head_dim axis —
    the standard KV-cache quantization granularity (one scale per
    written vector, so quantization is write-local and order-free)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(
        jnp.int8)
    return q8, s


def _cache_install(cache, kv, slot):
    """Install a (1, P, KVH, HD) prefill segment at cache[slot, :P]
    (both cache representations: bf16/f32 array, or the int8
    {"q8", "s"} pair — kv_bits=8)."""
    if isinstance(cache, dict):
        q8, s = _kv_quant(kv)
        return {"q8": jax.lax.dynamic_update_slice(
                    cache["q8"], q8, (slot, 0, 0, 0)),
                "s": jax.lax.dynamic_update_slice(
                    cache["s"], s.astype(cache["s"].dtype),
                    (slot, 0, 0))}
    return jax.lax.dynamic_update_slice(
        cache, kv.astype(cache.dtype), (slot, 0, 0, 0))


def _cache_scatter(cache, rows, cols, kv):
    """Scatter kv rows at cache[rows, cols] (decode-step single-token
    writes with per-row columns, or _admit_many's (N, P) segment
    scatter), for both cache representations."""
    if isinstance(cache, dict):
        q8, s = _kv_quant(kv)
        return {"q8": cache["q8"].at[rows, cols].set(q8),
                "s": cache["s"].at[rows, cols].set(
                    s.astype(cache["s"].dtype))}
    return cache.at[rows, cols].set(kv.astype(cache.dtype))


def _gqa_int8kv(q, kc, vc, kv_valid, sm_scale):
    """Decode attention over the int8 KV cache with EXACT rank-1
    scale folding: per cached column j,
    ``q . (k8_j * s_j) == (q . k8_j) * s_j`` (s_j rides the logits)
    and ``sum_j p_j (v8_j * s_j) == sum_j (p_j s_j) v8_j`` (s_j rides
    the probabilities) — so the dots stream pure int8 from HBM (the
    convert fuses into the dot operand read, models/quant docstring)
    and the only approximation is the 8-bit code itself. Grouped-KV,
    f32 softmax, -1e9 mask bias — the numerics twin of
    ops/attention._reference_attention for single-token queries."""
    b, _, h, d = q.shape
    kvh = kc["q8"].shape[2]
    g = h // kvh
    qg = q[:, 0].reshape(b, kvh, g, d)
    logits = jnp.einsum("bkgd,bckd->bkgc", qg,
                        kc["q8"].astype(q.dtype)).astype(jnp.float32)
    ks = kc["s"].astype(jnp.float32).transpose(0, 2, 1)   # (B, KVH, C)
    logits = logits * ks[:, :, None, :] * sm_scale
    mask = kv_valid.astype(bool)[:, None, None, :]
    logits = logits + jnp.where(mask, 0.0, jnp.float32(-1e9))
    p = jax.nn.softmax(logits, axis=-1)
    vs = vc["s"].astype(jnp.float32).transpose(0, 2, 1)
    p = (p * vs[:, :, None, :]).astype(q.dtype)
    o = jnp.einsum("bkgc,bckd->bkgd", p, vc["q8"].astype(q.dtype))
    return o.reshape(b, 1, h, d)


def _decode_layer_rowwise(p, c, x, cos, sin, cache_k, cache_v,
                          write_col, kv_valid):
    """One decoder layer, one token per row, PER-ROW cache depth.

    Twin of models/ref_generate._decode_layer except the KV write
    column is a (B,) vector (each slot is at its own depth) — a
    row-indexed scatter instead of a dynamic_update_slice — and
    kv_valid (B, C) is per-row rather than derived from a shared step
    counter. Caches may be int8 {"q8", "s"} pairs (kv_bits=8): writes
    quantize per token+head, attention folds the scales exactly
    (_gqa_int8kv)."""
    b = x.shape[0]
    eps = c.rms_eps
    dt = x.dtype
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
    rows = jnp.arange(b)
    cache_k = _cache_scatter(cache_k, rows, write_col, k[:, 0])
    cache_v = _cache_scatter(cache_v, rows, write_col, v[:, 0])
    if isinstance(cache_k, dict):
        o = _gqa_int8kv(q, cache_k, cache_v, kv_valid,
                        1.0 / math.sqrt(c.head_dim))
    else:
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


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 11, 17),
                   donate_argnums=(6,))
def _admit(cfg: RefCfg, grid_h: int, grid_w: int, dtype, params,
           decode_params, state, slot, patches, input_ids, attn_mask,
           visual_start: int, position_ids, next_pos0, boxes_xyxy,
           ori_wh, object_positions, sampling=(0.0, 0, 1.0),
           seed=0, cap=2**30):
    """Prefill ONE request and install it into slot ``slot``.

    input_ids/attn_mask (1, P); position_ids (3, 1, P); next_pos0 ()
    int32 first generated position; slot () int32 traced — one
    compile covers every slot. The first generated token is sampled
    here (from the decode/lm-head tree, matching ref_generate) and
    parked in cur_tok; the next _decode_chunk emits it. ``cap`` is
    the per-request generation cap (traced int32)."""
    from wedetect_tpu.models.ref import RefModules

    caches, prompt_mask, gen_count, next_pos, cur_tok, done, seeds, \
        caps = state
    mod = RefModules(cfg, grid_h, grid_w, dtype=dtype)
    hidden, kvs = mod.apply(
        {"params": params}, patches, input_ids, attn_mask,
        position_ids, boxes_xyxy, ori_wh, visual_start,
        object_positions, method=_prefill_hidden_kvs)
    last = jnp.sum(attn_mask[0]).astype(jnp.int32) - 1
    h_last = jax.lax.dynamic_index_in_dim(hidden[0], last, axis=0,
                                          keepdims=False)
    dp = params if decode_params is None else decode_params
    seed = jnp.asarray(seed, jnp.int32)
    tok0 = _sample_rows(_lm_logits(dp, h_last[None]), sampling,
                        seed[None], jnp.zeros((1,), jnp.int32))[0]

    new_caches = []
    for (kc, vc), (k, v) in zip(caches, kvs):
        new_caches.append((_cache_install(kc, k, slot),
                           _cache_install(vc, v, slot)))
    prompt_mask = jax.lax.dynamic_update_slice(
        prompt_mask, attn_mask.astype(jnp.int32), (slot, 0))
    gen_count = gen_count.at[slot].set(0)
    next_pos = next_pos.at[slot].set(next_pos0)
    cur_tok = cur_tok.at[slot].set(tok0)
    done = done.at[slot].set(False)
    seeds = seeds.at[slot].set(seed)
    caps = caps.at[slot].set(jnp.asarray(cap, jnp.int32))
    return (tuple(new_caches), prompt_mask, gen_count, next_pos,
            cur_tok, done, seeds, caps)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 11, 17),
                   donate_argnums=(6,))
def _admit_many(cfg: RefCfg, grid_h: int, grid_w: int, dtype, params,
                decode_params, state, slots, patches, input_ids,
                attn_mask, visual_start: int, position_ids, next_pos0,
                boxes_xyxy, ori_wh, object_positions,
                sampling=(0.0, 0, 1.0), lane_seeds=None,
                lane_caps=None):
    """Prefill N requests in ONE vmapped forward and install them into
    ``slots`` (N,). Batched admission: slot completions cluster in
    waves (all slots admitted together finish within a chunk or two of
    each other), so one b=N prefill replaces N serial b=1 prefills —
    the vision towers and the 384-token decoder prefill batch onto the
    MXU instead of running N undersized singleton programs.

    Shapes: slots (N,) int32; patches (N, S, Dp); input_ids/attn_mask
    (N, P); position_ids (3, N, P); next_pos0 (N,); boxes_xyxy
    (N, Q, 4); ori_wh (N, 2); object_positions (N, Q). The caller
    always passes N = slot-pool size, padding partial waves with
    duplicate lanes whose slot index is OUT OF BOUNDS — jax scatter
    drops OOB writes by default, so pad lanes compute a throwaway
    prefill and install nothing. One compile total."""
    from wedetect_tpu.models.ref import RefModules

    caches, prompt_mask, gen_count, next_pos, cur_tok, done, seeds, \
        caps = state
    if lane_seeds is None:
        lane_seeds = jnp.zeros(slots.shape, jnp.int32)
    if lane_caps is None:
        lane_caps = jnp.full(slots.shape, 2**30, jnp.int32)
    mod = RefModules(cfg, grid_h, grid_w, dtype=dtype)

    def one(patches_i, ids_i, mask_i, pos_i, boxes_i, ori_i, objp_i):
        return mod.apply(
            {"params": params}, patches_i, ids_i[None], mask_i[None],
            pos_i[:, None], boxes_i, ori_i, visual_start,
            objp_i[None], method=_prefill_hidden_kvs)

    hidden, kvs = jax.vmap(one, in_axes=(0, 0, 0, 1, 0, 0, 0))(
        patches, input_ids, attn_mask, position_ids, boxes_xyxy,
        ori_wh, object_positions)
    hidden = hidden[:, 0]                                  # (N, P, D)
    last = jnp.sum(attn_mask, axis=1).astype(jnp.int32) - 1
    h_last = jnp.take_along_axis(hidden, last[:, None, None],
                                 axis=1)[:, 0]
    dp = params if decode_params is None else decode_params
    tok0 = _sample_rows(_lm_logits(dp, h_last), sampling,
                        lane_seeds,
                        jnp.zeros(lane_seeds.shape, jnp.int32))

    n, p_len = attn_mask.shape
    rows = slots[:, None]
    cols = jnp.arange(p_len)[None, :]
    new_caches = []
    for (kc, vc), (k, v) in zip(caches, kvs):
        # k/v: (N, 1, P, KVH, HD) from the vmapped B=1 prefill
        new_caches.append((_cache_scatter(kc, rows, cols, k[:, 0]),
                           _cache_scatter(vc, rows, cols, v[:, 0])))
    prompt_mask = prompt_mask.at[slots].set(
        attn_mask.astype(jnp.int32))
    gen_count = gen_count.at[slots].set(0)
    next_pos = next_pos.at[slots].set(next_pos0)
    cur_tok = cur_tok.at[slots].set(tok0)
    done = done.at[slots].set(False)
    seeds = seeds.at[slots].set(lane_seeds)
    caps = caps.at[slots].set(lane_caps)
    return (tuple(new_caches), prompt_mask, gen_count, next_pos,
            cur_tok, done, seeds, caps)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 7),
                   donate_argnums=(6,))
def _decode_chunk(cfg: RefCfg, chunk: int, eos_id: int, pad_id: int,
                  dtype, params, state, sampling=(0.0, 0, 1.0)):
    """T lockstep single-token steps across all slots; returns
    ((B, T) emitted tokens, new state). Emission order matches
    ref_generate: each step emits the carried token (pad for done /
    empty rows), marks done on eos or the per-request cap, then
    computes the next token."""
    caches, prompt_mask, gen_count, next_pos, cur_tok, done, seeds, \
        caps = state
    c = cfg.text
    b, p_len = prompt_mask.shape
    kc0 = caches[0][0]
    g_cap = (kc0["q8"] if isinstance(kc0, dict) else kc0).shape[1] \
        - p_len
    params = prepare_decode_params(params)   # int4: unpack to s4 once
    tp = params["text"]
    emb = params["embed"]["embed_tokens"]["embedding"]
    gen_cols = jnp.arange(g_cap, dtype=jnp.int32)

    def body(carry, _):
        caches, gen_count, next_pos, cur_tok, done = carry
        # the carried token's generated index is gen_count: a request
        # capped at k emits exactly tokens 0..k-1 then frees its slot
        done = done | (gen_count >= caps)
        emitted = jnp.where(done, pad_id, cur_tok)
        done = done | (cur_tok == eos_id)
        x = emb[cur_tok][:, None, :].astype(dtype)
        pos3 = jnp.broadcast_to(next_pos[None, :, None], (3, b, 1))
        cos, sin = interleaved_mrope_cos_sin(pos3, c)
        wcol = p_len + jnp.minimum(gen_count, g_cap - 1)      # (B,)
        kv_valid = jnp.concatenate(
            [prompt_mask,
             (gen_cols[None] <= jnp.minimum(gen_count, g_cap - 1)
              [:, None]).astype(jnp.int32)], axis=1)
        new_caches = []
        for i in range(c.layers):
            kc, vc = caches[i]
            x, kc, vc = _decode_layer_rowwise(
                tp[f"layer{i}"], c, x, cos, sin, kc, vc, wcol,
                kv_valid)
            new_caches.append((kc, vc))
        h = _rms(x, tp["norm"]["scale"], c.rms_eps)[:, 0]
        # generated-token index of nxt is gen_count + 1 (cur_tok was
        # index gen_count) — see _sample_rows for the seeding scheme
        nxt = _sample_rows(_lm_logits(params, h), sampling, seeds,
                           gen_count + 1)
        nxt = jnp.where(done, cur_tok, nxt)
        gen_count = gen_count + 1
        next_pos = next_pos + 1
        return (tuple(new_caches), gen_count, next_pos, nxt, done), \
            emitted

    (caches, gen_count, next_pos, cur_tok, done), toks = jax.lax.scan(
        body, (caches, gen_count, next_pos, cur_tok, done),
        jnp.arange(chunk, dtype=jnp.int32))
    state = (caches, prompt_mask, gen_count, next_pos, cur_tok, done,
             seeds, caps)
    return toks.T, state


def _embed_prompt(mod, patches, input_ids, boxes_xyxy, ori_wh,
                  visual_start, object_positions):
    """RefModules method: the embedding-assembly half of the prefill —
    vision tower + RoI object features + token embeddings with the
    image/object scatters — STOPPING before the decoder. Returns
    ((P, D) merged embeddings, (n_taps, V, D) stacked deepstack taps).
    The decoder half runs inside _decode_chunk_pb, riding the
    HBM-bound decode steps."""
    img_tokens, obj, taps = mod._vision_and_objects(
        patches, boxes_xyxy, ori_wh)
    x = mod.embed(input_ids[None])                      # (1, P, D)
    x = jax.lax.dynamic_update_slice_in_dim(
        x, img_tokens[None].astype(x.dtype), visual_start, axis=1)
    x = mod._scatter_objects(x, obj, object_positions)
    dt = x.dtype
    return x[0], jnp.stack([t.astype(dt) for t in taps])


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _encode_prompt(cfg: RefCfg, grid_h: int, grid_w: int, dtype,
                   params, patches, input_ids, boxes_xyxy, ori_wh,
                   object_positions, visual_start):
    from wedetect_tpu.models.ref import RefModules

    mod = RefModules(cfg, grid_h, grid_w, dtype=dtype)
    emb, ds = mod.apply(
        {"params": params}, patches, input_ids, boxes_xyxy, ori_wh,
        visual_start, object_positions, method=_embed_prompt)
    return emb.astype(dtype), ds.astype(dtype)


def _pb_layer(p, c, x, cos, sin, cache_k, cache_v, wcol_dec,
              kv_valid_dec, kv_valid_pref, rows_pref, offs, pend_slot,
              n_dec):
    """One decoder layer over B decode rows + F piggybacked prompt
    rows. The QKV/MLP matmuls run on the CONCATENATED (B+F, 1, D)
    rows — one weight read serves both — then the two row groups
    split only for the cache scatter and attention:

    - decode rows (first n_dec): identical to _decode_layer_rowwise
      (per-row write column, per-row validity over the full cache).
    - prompt rows: K/V scattered into the admitted slot's prompt
      columns ``offs`` (rows_pref carries the OOB sentinel for pad
      rows / idle dispatches — jax scatter drops them), attention over
      the slot's prompt region only under kv_valid_pref (F, P), which
      encodes both intra-segment causality and the prompt's padding
      mask. Earlier segments' K/V are already in the cache and this
      segment's are written above, so the einsum sees exactly the
      classic prefill's key set per row."""
    bt = x.shape[0]
    eps = c.rms_eps
    dt = x.dtype
    y = _rms(x, p["input_ln"]["scale"], eps)
    q = matmul_any(y, p["q_proj"], dt)
    k = matmul_any(y, p["k_proj"], dt)
    v = matmul_any(y, p["v_proj"], dt)
    q = _rms(q.reshape(bt, 1, c.heads, c.head_dim),
             p["q_norm"]["scale"], eps)
    k = _rms(k.reshape(bt, 1, c.kv_heads, c.head_dim),
             p["k_norm"]["scale"], eps)
    v = v.reshape(bt, 1, c.kv_heads, c.head_dim)
    q, k = _apply_rope(q, k, cos[:, :, None, :], sin[:, :, None, :])
    rows = jnp.arange(n_dec)
    cache_k = cache_k.at[rows, wcol_dec].set(
        k[:n_dec, 0].astype(cache_k.dtype))
    cache_v = cache_v.at[rows, wcol_dec].set(
        v[:n_dec, 0].astype(cache_v.dtype))
    cache_k = cache_k.at[rows_pref, offs].set(
        k[n_dec:, 0].astype(cache_k.dtype))
    cache_v = cache_v.at[rows_pref, offs].set(
        v[n_dec:, 0].astype(cache_v.dtype))
    o_dec = gqa_attention(q[:n_dec], cache_k, cache_v, causal=False,
                          kv_valid=kv_valid_dec,
                          sm_scale=1.0 / math.sqrt(c.head_dim),
                          impl="einsum")
    # prompt-row attention against the slot's prompt region (exact
    # einsum twin of ops/attention._reference_attention, grouped-KV
    # without the repeat: query head j = kv*G + g reads kv head kv)
    f = bt - n_dec
    p_len = kv_valid_pref.shape[1]
    g = c.heads // c.kv_heads
    slot_r = jnp.minimum(pend_slot, n_dec - 1)
    ck = jax.lax.dynamic_index_in_dim(cache_k, slot_r, axis=0,
                                      keepdims=False)[:p_len]
    cv = jax.lax.dynamic_index_in_dim(cache_v, slot_r, axis=0,
                                      keepdims=False)[:p_len]
    qp = q[n_dec:, 0].reshape(f, c.kv_heads, g, c.head_dim)
    logits = jnp.einsum("fkgd,pkd->fkgp", qp, ck).astype(jnp.float32)
    logits = logits * (1.0 / math.sqrt(c.head_dim))
    maskb = kv_valid_pref.astype(bool)[:, None, None, :]
    logits = logits + jnp.where(maskb, 0.0, jnp.float32(-1e9))
    pr = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o_pref = jnp.einsum("fkgp,pkd->fkgd", pr, cv).reshape(
        f, 1, c.heads * c.head_dim)
    o = jnp.concatenate(
        [o_dec.astype(dt).reshape(n_dec, 1, -1), o_pref.astype(dt)],
        axis=0)
    x = x + matmul_any(o, p["o_proj"], dt)
    y = _rms(x, p["post_ln"]["scale"], eps)
    gate = matmul_any(y, p["gate_proj"], dt)
    up = matmul_any(y, p["up_proj"], dt)
    return x + matmul_any(jax.nn.silu(gate) * up, p["down_proj"], dt), \
        cache_k, cache_v


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 15),
                   donate_argnums=(6,))
def _decode_chunk_pb(cfg: RefCfg, chunk: int, eos_id: int, pad_id: int,
                     dtype, params, state, pend_emb, pend_ds,
                     pend_mask, pend_pos, pend_len, pend_np0,
                     pend_slot, visual_start,
                     sampling=(0.0, 0, 1.0), pend_seed=0,
                     pend_cap=2**30):
    """_decode_chunk with ONE piggybacked admission: each of the T
    scan steps also processes F = ceil(P/T) rows of the pending
    prompt, so the whole prompt's decoder prefill completes within the
    chunk, riding the decode steps' weight reads. The admitted slot
    installs (done=False, first token parked) AFTER the scan, so its
    first emission lands in the NEXT chunk — exactly the classic
    _admit stream. An idle dispatch passes pend_slot == slots
    (out-of-bounds): every install scatter drops and the prompt rows
    are inert throwaway compute.

    pend_emb (P, D) / pend_ds (n_taps, V, D) come from _encode_prompt;
    pend_mask (P,) int32; pend_pos (3, P) MRoPE ids; pend_len / pend_np0
    / pend_slot / visual_start () int32 scalars (all traced — one
    compile serves admissions and idle dispatches alike)."""
    caches, prompt_mask, gen_count, next_pos, cur_tok, done, seeds, \
        caps = state
    pend_seed = jnp.asarray(pend_seed, jnp.int32)
    c = cfg.text
    b, p_len = prompt_mask.shape
    g_cap = caches[0][0].shape[1] - p_len
    f = -(-p_len // chunk)
    l_pad = f * chunk
    params = prepare_decode_params(params)   # int4: unpack to s4 once
    tp = params["text"]
    emb = params["embed"]["embed_tokens"]["embedding"]
    gen_cols = jnp.arange(g_cap, dtype=jnp.int32)
    prompt_cols = jnp.arange(p_len, dtype=jnp.int32)
    n_taps, n_vis = pend_ds.shape[0], pend_ds.shape[1]

    # install the admitted prompt's mask up front: the slot stays
    # done=True for the whole chunk so its decode rows are inert
    prompt_mask = prompt_mask.at[pend_slot].set(
        pend_mask.astype(jnp.int32))
    pe = jnp.pad(pend_emb, ((0, l_pad - p_len), (0, 0)))
    pp = jnp.pad(pend_pos, ((0, 0), (0, l_pad - p_len)))

    def body(carry, t):
        caches, gen_count, next_pos, cur_tok, done, h_pend = carry
        done = done | (gen_count >= caps)       # per-request cap
        emitted = jnp.where(done, pad_id, cur_tok)
        done = done | (cur_tok == eos_id)
        x_dec = emb[cur_tok][:, None, :].astype(dtype)
        seg = t * f
        offs = seg + jnp.arange(f, dtype=jnp.int32)
        x_pref = jax.lax.dynamic_slice(
            pe, (seg, 0), (f, pe.shape[1]))[:, None, :].astype(dtype)
        x = jnp.concatenate([x_dec, x_pref], axis=0)
        pos_dec = jnp.broadcast_to(next_pos[None, :, None], (3, b, 1))
        pos_pref = jax.lax.dynamic_slice(
            pp, (0, seg), (3, f))[:, :, None]
        cos, sin = interleaved_mrope_cos_sin(
            jnp.concatenate([pos_dec, pos_pref], axis=1), c)
        wcol_dec = p_len + jnp.minimum(gen_count, g_cap - 1)
        kv_valid_dec = jnp.concatenate(
            [prompt_mask,
             (gen_cols[None] <= jnp.minimum(gen_count, g_cap - 1)
              [:, None]).astype(jnp.int32)], axis=1)
        kv_valid_pref = ((prompt_cols[None, :] <= offs[:, None])
                         & (pend_mask > 0)[None, :]).astype(jnp.int32)
        rows_pref = jnp.where(offs < p_len, pend_slot, b)
        new_caches = []
        for i in range(c.layers):
            kc, vc = caches[i]
            x, kc, vc = _pb_layer(
                tp[f"layer{i}"], c, x, cos, sin, kc, vc, wcol_dec,
                kv_valid_dec, kv_valid_pref, rows_pref, offs,
                pend_slot, b)
            if i < n_taps:
                # deepstack tap injection at the vision span, exactly
                # where prefix_pass injects it (after layer i)
                idx = offs - visual_start
                dvalid = (idx >= 0) & (idx < n_vis)
                add = pend_ds[i][jnp.clip(idx, 0, n_vis - 1)]
                add = jnp.where(dvalid[:, None], add,
                                jnp.zeros_like(add)).astype(dtype)
                x = x.at[b:, 0, :].add(add)
            new_caches.append((kc, vc))
        h = _rms(x[:b], tp["norm"]["scale"], c.rms_eps)[:, 0]
        nxt = _sample_rows(_lm_logits(params, h), sampling, seeds,
                           gen_count + 1)
        nxt = jnp.where(done, cur_tok, nxt)
        # capture the prompt's last-real-token hidden when this
        # step's segment contains it (used to sample tok0 post-scan)
        last_idx = pend_len - 1 - seg
        in_seg = (last_idx >= 0) & (last_idx < f)
        h_pref = _rms(x[b:], tp["norm"]["scale"], c.rms_eps)[:, 0]
        h_cand = h_pref[jnp.clip(last_idx, 0, f - 1)]
        h_pend = jnp.where(in_seg, h_cand, h_pend)
        gen_count = gen_count + 1
        next_pos = next_pos + 1
        return (tuple(new_caches), gen_count, next_pos, nxt, done,
                h_pend), emitted

    h0 = jnp.zeros((c.hidden,), dtype)
    (caches, gen_count, next_pos, cur_tok, done, h_pend), toks = \
        jax.lax.scan(
            body, (caches, gen_count, next_pos, cur_tok, done, h0),
            jnp.arange(chunk, dtype=jnp.int32))
    # activate the admitted slot (all scatters drop on the OOB
    # sentinel): first token parked, emitted by the next chunk
    tok0 = _sample_rows(_lm_logits(params, h_pend[None]), sampling,
                        pend_seed[None],
                        jnp.zeros((1,), jnp.int32))[0]
    gen_count = gen_count.at[pend_slot].set(0)
    next_pos = next_pos.at[pend_slot].set(pend_np0)
    cur_tok = cur_tok.at[pend_slot].set(tok0)
    done = done.at[pend_slot].set(False)
    seeds = seeds.at[pend_slot].set(pend_seed)
    caps = caps.at[pend_slot].set(jnp.asarray(pend_cap, jnp.int32))
    state = (caches, prompt_mask, gen_count, next_pos, cur_tok, done,
             seeds, caps)
    return toks.T, state


class GenServer:
    """Continuous-batching greedy generation over a fixed slot pool.

    Usage::

        srv = GenServer(cfg, gh, gw, params, slots=8, prompt_len=384,
                        max_new=128, chunk=16, eos_id=..., dtype=...)
        rid = srv.submit(patches, ids, mask, pos, visual_start,
                         next_pos0)        # any number of requests
        results = srv.run()                # {rid: np.int32 tokens}

    All requests must share the padded prompt bucket ``prompt_len``,
    the image grid (grid_h, grid_w) and ``visual_start`` (one prompt
    template — the RefScorer grid-bucket discipline); real lengths
    vary freely via the mask. ``decode_params`` accepts the
    models/quant weight-only-int8 tree, as in ref_generate.

    ``kv_bits=8`` stores the KV pool as int8 codes + per-(token,
    head) f32 scales (module docstring): ~0.52x pool HBM and decode
    KV read traffic, exact scale folding in the attention, lossy only
    through the 8-bit code. Opt-in; incompatible with piggyback (the
    ridden prompt rows read the bf16 cache directly).

    ``batch_admit=True`` admits shape-compatible waves through ONE
    vmapped prefill (_admit_many) instead of per-request prefills.
    Default OFF: measured on the v5e (PERF.md round-4 serving
    section), the pipelined run already hides admit dispatch latency
    and b=1 384-token prefills already saturate the MXU, so batching
    bought nothing and the vmapped lanes cost ~7% — kept as an option
    for deployments with many tiny prompts where b=1 prefill is
    launch-bound.

    ``piggyback=True`` rides each steady-state admission's decoder
    prefill on the decode chunks (see module docstring): one
    admission per chunk goes through _encode_prompt + _decode_chunk_pb
    (its decoder FLOPs share the HBM-bound decode steps' weight
    reads); additional free slots (startup fill, completion bursts)
    still use the classic _admit. With ``decode_params`` set
    (weight-only int8), the ridden prompt rows read the int8 decode
    tree too — classic admission keeps the prefill full-precision.
    """

    def __init__(self, cfg: RefCfg, grid_h: int, grid_w: int, params,
                 *, slots: int = 8, prompt_len: int, max_new: int,
                 chunk: int = 16, eos_id: int, pad_id: int = 0,
                 dtype=jnp.float32, decode_params=None,
                 batch_admit: bool = False, piggyback: bool = False,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, mesh=None, tp_axis: str = "tp",
                 kv_bits: int = 16):
        assert chunk >= 1 and max_new >= 1 and slots >= 1
        assert kv_bits in (16, 8), kv_bits
        assert not (piggyback and kv_bits == 8), \
            "piggyback prefill rides full-precision caches only"
        self.kv_bits = kv_bits
        self.batch_admit = batch_admit
        self.piggyback = piggyback
        # static sampling triple shared by every compiled program
        # (see _sample_rows); top_k/top_p only apply when T > 0
        self.sampling = (float(temperature), int(top_k), float(top_p))
        self.cfg, self.gh, self.gw = cfg, grid_h, grid_w
        self.params = params
        self.decode_params = decode_params
        self.slots, self.P, self.G = slots, prompt_len, max_new
        self.chunk = chunk
        self.eos_id, self.pad_id = eos_id, pad_id
        self.dtype = dtype
        c = cfg.text
        cap = prompt_len + max_new
        kv_shape = (slots, cap, c.kv_heads, c.head_dim)
        if mesh is not None:
            # tensor-parallel serving (params Megatron-sharded via
            # parallel/mesh.ref_tp_sharding): pin the KV pool sharded
            # over the kv-head axis so the donated state keeps one
            # stable layout instead of whatever propagation picks —
            # each decode step then reads/writes only the local heads.
            # Data-parallel serving is one GenServer per data replica.
            from jax.sharding import (NamedSharding,
                                      PartitionSpec as Pspec)
            n_tp = mesh.shape[tp_axis]
            shardable = c.kv_heads % n_tp == 0
            kv_spec = (Pspec(None, None, tp_axis, None) if shardable
                       else Pspec())
            s_spec = (Pspec(None, None, tp_axis) if shardable
                      else Pspec())

            def zeros(shape, dt):
                spec = kv_spec if len(shape) == 4 else s_spec
                return jnp.zeros(shape, dt,
                                 device=NamedSharding(mesh, spec))
        else:
            zeros = jnp.zeros
        if kv_bits == 8:
            # int8 KV pool: int8 codes + per-(slot, col, head) f32
            # absmax scales — ~0.52x the bf16 pool's HBM (and decode
            # KV read traffic); quantization happens at each write
            # (_kv_quant), attention folds the scales exactly
            # (_gqa_int8kv), so the only loss is the 8-bit code
            s_shape = (slots, cap, c.kv_heads)

            def one_cache():
                return {"q8": zeros(kv_shape, jnp.int8),
                        "s": zeros(s_shape, jnp.float32)}

            caches = tuple((one_cache(), one_cache())
                           for _ in range(c.layers))
        else:
            caches = tuple(
                (zeros(kv_shape, dtype), zeros(kv_shape, dtype))
                for _ in range(c.layers))
        self._state = (
            caches,
            jnp.zeros((slots, prompt_len), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.full((slots,), pad_id, jnp.int32),
            jnp.ones((slots,), bool),
            jnp.zeros((slots,), jnp.int32),
            jnp.full((slots,), max_new, jnp.int32))
        self._queue = deque()
        self._live = {}            # slot -> req id
        self._buf = {}             # req id -> [tokens]
        self._out = {}             # req id -> np.ndarray (finished)
        self._next_id = 0
        # optional streaming hook: called from _collect (the engine
        # thread) as on_tokens(rid, [new tokens]) whenever a readback
        # appends tokens to a live request — lets a serving front-end
        # stream tokens per chunk instead of waiting for completion
        self.on_tokens = None
        # piggyback lane: (slot, rid, encoded args) reserved by
        # _admit_queued, consumed by the next _dispatch_chunk (which
        # falls back to the plain _decode_chunk when nothing pends —
        # idle chunks never pay the prompt rows)
        self._pend_attach = None
        # scheduling counters for the PERF.md gap accounting:
        # chunks * chunk * slots = decode slot-steps issued; delivered
        # tokens / slot-steps = occupancy (the rest is slot idle +
        # post-EOS waste); admits = prefill forwards
        self.stats = {"chunks": 0, "admits": 0}

    def submit(self, patches, input_ids, attn_mask, position_ids,
               visual_start: int, next_pos0: int, boxes_xyxy=None,
               ori_wh=None, object_positions=None, seed=None,
               max_new=None) -> int:
        """Queue one request. input_ids/attn_mask (P,) or (1, P);
        position_ids (3, P) or (3, 1, P). boxes/object_positions as in
        ref_generate (None = caption-only dummy). ``seed`` drives this
        request's sampling stream when the server runs with
        temperature > 0 (default: the request id — distinct streams
        per request, reproducible across runs and scheduling).
        ``max_new`` caps THIS request's generated tokens (<= the
        pool-wide G): the slot goes done and refills once the cap is
        hit, instead of burning decode steps to G whose output would
        be discarded. Returns a request id resolved by step()/run()."""
        ids = np.asarray(input_ids, np.int32).reshape(1, self.P)
        mask = np.asarray(attn_mask, np.int32).reshape(1, self.P)
        pos = np.asarray(position_ids, np.int32).reshape(3, 1, self.P)
        if boxes_xyxy is None:
            boxes_xyxy = np.array([[0, 0, 10, 10]], np.float32)
        if ori_wh is None:
            ori_wh = np.array([10.0, 10.0], np.float32)
        if object_positions is None:
            object_positions = np.full((1, 1), -1, np.int32)
        cap = self.G if max_new is None else max(1, min(int(max_new),
                                                        self.G))
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, patches, ids, mask, pos,
                            int(visual_start), int(next_pos0),
                            boxes_xyxy, ori_wh, object_positions,
                            int(rid if seed is None else seed), cap))
        self._buf[rid] = []
        return rid

    def _free_slots(self):
        return [s for s in range(self.slots) if s not in self._live]

    @staticmethod
    def _batchable(a, b):
        """Two queued requests can share one _admit_many call when
        their aux shapes (and the static visual_start) agree."""
        return (np.shape(a[1]) == np.shape(b[1])        # patches
                and a[5] == b[5]                         # visual_start
                and np.shape(a[7]) == np.shape(b[7])     # boxes
                and np.shape(a[9]) == np.shape(b[9]))    # objpos

    def _admit_queued(self):
        """Dispatch prefills for every queued request that fits a free
        slot (async — jit dispatch returns immediately). Consecutive
        shape-compatible requests are admitted in ONE vmapped batch
        prefill (_admit_many), bucketed to powers of two to bound the
        compile count — slot completions cluster in waves, so the
        initial fill and each refill wave batch their vision towers +
        decoder prefills onto the MXU instead of running N singleton
        programs."""
        free = self._free_slots()
        if self.piggyback and self._pend_attach is None and free \
                and self._queue:
            # reserve ONE admission for the piggyback lane (consumed
            # by the next _dispatch_chunk); vision encode dispatches
            # asynchronously now. Remaining free slots fall through to
            # the classic admit below (startup fill, bursts).
            slot = free.pop(0)
            item = self._queue.popleft()
            self._pend_attach = (slot, item[0], self._encode(item))
        while free and self._queue:
            n = min(len(free), len(self._queue))
            if self.batch_admit:
                head = self._queue[0]
                r = 1
                while r < n and self._batchable(head, self._queue[r]):
                    r += 1
                n = r
            # a padded batch computes a full slots-wide prefill, so it
            # only wins when the wave is at least ~half the pool
            # (n * C_single > C_batch); smaller waves go singleton
            if not self.batch_admit or n < max(2, (self.slots + 1) // 2):
                n = 1
            items = [self._queue.popleft() for _ in range(n)]
            slots_n, free = free[:n], free[n:]
            if n == 1:
                (rid, patches, ids, mask, pos, vs, np0, boxes, ori,
                 objp, seed, cap) = items[0]
                self._state = _admit(
                    self.cfg, self.gh, self.gw, self.dtype,
                    self.params, self.decode_params, self._state,
                    jnp.asarray(slots_n[0], jnp.int32),
                    jnp.asarray(patches), jnp.asarray(ids),
                    jnp.asarray(mask), vs, jnp.asarray(pos),
                    jnp.asarray(np0, jnp.int32), jnp.asarray(boxes),
                    jnp.asarray(ori), jnp.asarray(objp),
                    self.sampling, jnp.asarray(seed, jnp.int32),
                    jnp.asarray(cap, jnp.int32))
                self._live[slots_n[0]] = rid
            else:
                vs = items[0][5]
                # pad the wave to the full slot width with duplicate
                # lanes targeting an OUT-OF-BOUNDS slot (scatter drops
                # them) — one _admit_many compile serves every wave
                # size
                pad = self.slots - n
                lanes = items + [items[0]] * pad
                slot_idx = np.asarray(
                    list(slots_n) + [self.slots] * pad, np.int32)
                self._state = _admit_many(
                    self.cfg, self.gh, self.gw, self.dtype,
                    self.params, self.decode_params, self._state,
                    jnp.asarray(slot_idx),
                    jnp.stack([jnp.asarray(it[1]) for it in lanes]),
                    jnp.asarray(np.stack([np.asarray(it[2])
                                          .reshape(self.P)
                                          for it in lanes])),
                    jnp.asarray(np.stack([np.asarray(it[3])
                                          .reshape(self.P)
                                          for it in lanes])),
                    vs,
                    jnp.asarray(np.stack([np.asarray(it[4])
                                          .reshape(3, self.P)
                                          for it in lanes], axis=1)),
                    jnp.asarray(np.asarray([it[6] for it in lanes],
                                           np.int32)),
                    jnp.asarray(np.stack([np.asarray(it[7])
                                          for it in lanes])),
                    jnp.asarray(np.stack([np.asarray(it[8])
                                          for it in lanes])),
                    jnp.asarray(np.stack([np.asarray(it[9]).ravel()
                                          for it in lanes])),
                    self.sampling,
                    jnp.asarray(np.asarray([it[10] for it in lanes],
                                           np.int32)),
                    jnp.asarray(np.asarray([it[11] for it in lanes],
                                           np.int32)))
                for slot, it in zip(slots_n, items):
                    self._live[slot] = it[0]
                self.stats["admit_batches"] = \
                    self.stats.get("admit_batches", 0) + 1
            self.stats["admits"] += n

    def _encode(self, item):
        """Dispatch the embedding-assembly half of one admission
        (async); returns the _decode_chunk_pb pend args minus slot."""
        (rid, patches, ids, mask, pos, vs, np0, boxes, ori,
         objp, seed, cap) = item
        emb, ds = _encode_prompt(
            self.cfg, self.gh, self.gw, self.dtype, self.params,
            jnp.asarray(patches),
            jnp.asarray(np.asarray(ids).reshape(self.P)),
            jnp.asarray(boxes), jnp.asarray(ori), jnp.asarray(objp),
            jnp.asarray(vs, jnp.int32))
        return (emb, ds,
                jnp.asarray(np.asarray(mask).reshape(self.P),
                            jnp.int32),
                jnp.asarray(np.asarray(pos).reshape(3, self.P),
                            jnp.int32),
                jnp.asarray(int(np.asarray(mask).sum()), jnp.int32),
                jnp.asarray(np0, jnp.int32),
                jnp.asarray(vs, jnp.int32),
                jnp.asarray(seed, jnp.int32),
                jnp.asarray(cap, jnp.int32))

    def _dispatch_chunk(self):
        """Dispatch one decode chunk (async); returns the device
        tokens array and the slot->rid mapping as of this chunk. In
        piggyback mode the chunk also carries the reserved admission's
        prompt rows; the admitted rid joins the live map AFTER the
        snapshot (its first emission lands in the next chunk — exactly
        when _decode_chunk_pb's post-scan install makes it appear)."""
        dp = (self.params if self.decode_params is None
              else self.decode_params)
        pend = self._pend_attach if self.piggyback else None
        if pend is None:
            # no admission pending: plain chunk — idle dispatches must
            # not pay the F prompt rows (measured 12% heavier steps;
            # PERF.md "Piggyback prefill: measured")
            toks, self._state = _decode_chunk(
                self.cfg, self.chunk, self.eos_id, self.pad_id,
                self.dtype, dp, self._state, self.sampling)
            self.stats["chunks"] += 1
            return toks, dict(self._live)
        slot_i, rid, (emb, ds, mask, pos, ln, np0, vs, seed, cap) = pend
        slot = jnp.asarray(slot_i, jnp.int32)
        toks, self._state = _decode_chunk_pb(
            self.cfg, self.chunk, self.eos_id, self.pad_id,
            self.dtype, dp, self._state, emb, ds, mask, pos, ln, np0,
            slot, vs, self.sampling, seed, cap)
        snap = dict(self._live)
        if pend is not None:
            self._live[pend[0]] = pend[1]
            self._pend_attach = None
            self.stats["admits"] += 1
            self.stats["pb_admits"] = \
                self.stats.get("pb_admits", 0) + 1
        self.stats["chunks"] += 1
        return toks, snap

    def _collect(self, toks, live_snap):
        """Block on one chunk's tokens and drain finished requests.
        live_snap is the slot->rid mapping at the chunk's dispatch —
        under the pipelined run() a slot may have been re-admitted
        since, so rows are resolved against the snapshot and stale
        (already-finished) rids are skipped."""
        toks = np.asarray(toks)                       # one readback
        finished = {}
        for slot, rid in live_snap.items():
            buf = self._buf.get(rid)
            if buf is None:                            # finished earlier
                continue
            n0 = len(buf)
            hit_end = False
            for t in toks[slot]:
                t = int(t)
                if t == self.eos_id or t == self.pad_id \
                        or len(buf) >= self.G:
                    hit_end = True
                    break
                buf.append(t)
            if self.on_tokens is not None and len(buf) > n0:
                self.on_tokens(rid, buf[n0:])
            if hit_end or len(buf) >= self.G:
                out = np.asarray(buf, np.int32)
                self._out[rid] = out
                finished[rid] = out
                if self._live.get(slot) == rid:
                    del self._live[slot]
                del self._buf[rid]
        return finished

    def step(self):
        """Admit queued requests into free slots, decode one chunk,
        drain finished requests. Returns {rid: tokens} finished this
        step (also accumulated for run()). Synchronous — one readback
        per call; run() pipelines instead."""
        self._admit_queued()
        return self._collect(*self._dispatch_chunk())

    @property
    def busy(self) -> bool:
        """True while any request is queued or decoding."""
        return bool(self._queue or self._live)

    def pump(self, pending=None):
        """One pipelined scheduler turn for long-lived serving loops
        (e.g. the HTTP front-end, models/serve_http): admit queued
        requests and dispatch one decode chunk (async) if any work is
        live, then collect the PREVIOUS turn's tokens. Returns
        (next_pending, finished): pass next_pending back on the next
        call; finished maps rid -> np.int32 tokens completed this
        turn. run(pipeline=True) is exactly this loop driven to
        drain; external callers interleave submit() between turns.
        The final turn (busy False, pending not None) only collects."""
        nxt = None
        if self._queue or self._live:
            self._admit_queued()
            nxt = self._dispatch_chunk()
        finished = {}
        if pending is not None:
            finished = self._collect(*pending)
        return nxt, finished

    def run(self, pipeline: bool = True):
        """Drive decoding until every queued/live request finishes.
        Returns {rid: np.int32 tokens (eos/pad excluded)}.

        pipeline=True (default) overlaps each chunk's device->host
        token readback with the NEXT chunk's device compute (jax
        dispatch is async; only np.asarray blocks): the device never
        idles waiting for the host round-trip, which on tunneled
        transports costs 30-200 ms per chunk (PERF.md "Transport
        sensitivity"). The cost is that a finished slot is discovered
        one chunk later, so its refill lags one chunk (<= chunk idle
        slot-steps per completion) — a good trade whenever the
        round-trip exceeds chunk * per-step time. Token streams are
        identical either way (scheduling changes, results never do —
        pinned in tests/test_serve.py)."""
        if not pipeline:
            while self._queue or self._live:
                self.step()
        else:
            pending = None
            while self._queue or self._live or pending is not None:
                pending, _ = self.pump(pending)
        out, self._out = self._out, {}
        return out
