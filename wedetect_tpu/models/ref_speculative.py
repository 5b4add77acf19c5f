"""Draft-free speculative decoding (prompt-lookup) for WeDetect-Ref.

The KV-cache decode step (models/ref_generate) is HBM-bandwidth-bound:
one generated token streams the full decoder weight set from HBM. A
verify step over K candidate tokens streams the SAME bytes (the K-row
matmuls are still far below the MXU roofline), so if K_acc of the K
candidates are accepted, the per-token weight traffic drops by
~(K_acc + 1)x. Drafts come from PROMPT LOOKUP (n-gram continuation:
match the last `ngram` emitted tokens against the prompt + generated
history and propose the tokens that followed the most recent match) —
no second draft model, so this composes with any checkpoint. Grounded
captioning/chat replays long spans of the prompt (class names, query
text), which is exactly where prompt lookup shines; on text with no
history match every step degenerates to the plain single-token decode
(the draft is rejected, one token still emits — never slower in
tokens/step).

EXACTNESS: greedy-only, and the emitted sequence is exactly the greedy
sequence — every emitted token is the model's own argmax (drafted
tokens are only accepted where they EQUAL the verify forward's argmax;
the first mismatch position emits the argmax instead). Pinned by
token-for-token equality with models/ref_generate in
tests/test_ref_speculative.py.

No reference counterpart: the reference inherits HF ``.generate()``
with no assisted/speculative path
(wedetect_ref/models/qwen3vl_grounding.py:311-379).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from wedetect_tpu.models.quant import matmul_any, prepare_decode_params
from wedetect_tpu.models.ref_generate import (_lm_logits,
                                              _prefill_hidden_kvs, _rms)
from wedetect_tpu.nn.qwen3vl import (RefCfg, _apply_rope,
                                     interleaved_mrope_cos_sin)


def _spec_attention(q, k, v, mask, sm_scale):
    """ops/attention._reference_attention with a PER-QUERY-ROW mask
    (B, K, C) — same einsums / f32 softmax / -1e9 bias so the verify
    block's numerics match the single-token decode path. KV heads are
    repeated (K is tiny; the block never runs a flash kernel)."""
    g = q.shape[2] // k.shape[2]
    if g > 1:
        k = jnp.repeat(k, g, axis=2)
        v = jnp.repeat(v, g, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    logits = logits * sm_scale
    logits = logits + jnp.where(mask, 0.0, jnp.float32(-1e9))[:, None]
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _decode_layer_block(p, cfg, x, cos, sin, cache_k, cache_v,
                        write_at, mask):
    """One decoder layer over a K-token verify block.

    x (B, K, D); cache_k/v (B, C, KVH, HD) — the block's post-rope KV
    is written at PER-ROW offsets ``write_at`` (B, K) (rows desync
    once different rows accept different draft lengths) and each query
    attends the cache under ``mask`` (B, K, C). Same param tree +
    matmul/norm order as ref_generate._decode_layer."""
    c = cfg
    b, kq = x.shape[:2]
    eps = c.rms_eps
    dt = x.dtype
    y = _rms(x, p["input_ln"]["scale"], eps)
    q = matmul_any(y, p["q_proj"], dt)
    k = matmul_any(y, p["k_proj"], dt)
    v = matmul_any(y, p["v_proj"], dt)
    q = _rms(q.reshape(b, kq, c.heads, c.head_dim),
             p["q_norm"]["scale"], eps)
    k = _rms(k.reshape(b, kq, c.kv_heads, c.head_dim),
             p["k_norm"]["scale"], eps)
    v = v.reshape(b, kq, c.kv_heads, c.head_dim)
    q, k = _apply_rope(q, k, cos[:, :, None, :], sin[:, :, None, :])
    rows = jnp.arange(b)[:, None]
    cache_k = cache_k.at[rows, write_at].set(k.astype(cache_k.dtype))
    cache_v = cache_v.at[rows, write_at].set(v.astype(cache_v.dtype))
    o = _spec_attention(q, cache_k, cache_v, mask,
                        1.0 / math.sqrt(c.head_dim))
    x = x + matmul_any(o.astype(dt).reshape(b, kq, -1), p["o_proj"], dt)
    y = _rms(x, p["post_ln"]["scale"], eps)
    gate = matmul_any(y, p["gate_proj"], dt)
    up = matmul_any(y, p["up_proj"], dt)
    return x + matmul_any(jax.nn.silu(gate) * up, p["down_proj"], dt), \
        cache_k, cache_v


def draft_lookup(hist, prev_gram, valid, spec_k):
    """Prompt-lookup drafting: find the MOST RECENT position where the
    n-gram ``prev_gram`` (B, n) occurs in ``hist`` (B, Lh) over fully
    ``valid`` (B, Lh) slots AND whose continuation start (position
    i + n) is also valid — without that constraint the latest match is
    always the one hugging the generation frontier, whose continuation
    is the not-yet-written pad region. Returns the spec_k - 1 tokens
    that followed the match (B, spec_k - 1; tokens past the valid
    region are whatever sits in the buffer — they simply get rejected
    at verification) plus a found flag (B,). Pure function
    (unit-tested directly)."""
    b, lh = hist.shape
    n = prev_gram.shape[1]
    i = jnp.arange(lh - n)
    ok = jnp.ones((b, lh - n), bool)
    for j in range(n):
        ok = ok & (jax.lax.dynamic_slice_in_dim(hist, j, lh - n, 1)
                   == prev_gram[:, j:j + 1])
        ok = ok & jax.lax.dynamic_slice_in_dim(
            valid.astype(bool), j, lh - n, 1)
    ok = ok & jax.lax.dynamic_slice_in_dim(
        valid.astype(bool), n, lh - n, 1)
    found = ok.any(axis=1)
    best = jnp.max(jnp.where(ok, i[None], -1), axis=1)    # last match
    src = best + n                                        # continuation
    gidx = jnp.clip(src[:, None] + jnp.arange(spec_k - 1)[None],
                    0, lh - 1)
    draft = jnp.take_along_axis(hist, gidx, axis=1)
    return draft, found


@functools.partial(
    jax.jit, static_argnums=(0, 1, 2, 8, 12, 13, 14, 17, 18, 19, 20))
def ref_generate_spec(cfg: RefCfg, grid_h: int, grid_w: int, params,
                      patches, input_ids, attn_mask, position_ids,
                      visual_start: int, next_pos, boxes_xyxy, ori_wh,
                      max_new_tokens: int, eos_id: int,
                      pad_id: int = 0,
                      object_positions=None, decode_params=None,
                      spec_k: int = 8, ngram: int = 2,
                      dtype=jnp.float32, force_reject: bool = False):
    """Greedy generation with prompt-lookup speculative decoding.

    Same arguments/layout contract as ref_generate (batched
    right-padded prompts, one shared image) minus temperature (greedy
    only — sampling would need rejection-sampling to stay exact).
    decode_params as in ref_generate (weight-only-int8 tree — the two
    features compose: int8 halves the bytes per step, speculation the
    steps per token). Returns (tokens (B, max_new), steps) where
    ``steps`` (scalar int32) is the number of verify forwards taken —
    steps < max_new means speculation accepted drafts.

    force_reject=True discards every draft (each K-wide verify emits
    exactly 1 token): the acceptance-collapse regime a non-repetitive
    continuation produces. bench.bench_spec measures it as the honest
    lower bound; the output stays greedy-exact.
    """
    from wedetect_tpu.models.ref import RefModules

    c = cfg
    b = input_ids.shape[0]
    if object_positions is None:
        object_positions = jnp.full((b, 1), -1, jnp.int32)
    mod = RefModules(c, grid_h, grid_w, dtype=dtype)
    hidden, kvs = mod.apply(
        {"params": params}, patches, input_ids, attn_mask,
        position_ids, boxes_xyxy, ori_wh, visual_start,
        object_positions, method=_prefill_hidden_kvs)
    dp = params if decode_params is None else decode_params
    return _spec_decode(c, dp, hidden, kvs, input_ids, attn_mask,
                        next_pos, max_new_tokens, eos_id, pad_id,
                        spec_k, ngram, dtype, force_reject)


def _spec_decode(c, params, hidden, kvs, input_ids, attn_mask,
                 next_pos, max_new, eos_id, pad_id, spec_k, ngram,
                 dtype, force_reject=False):
    b, p_len = attn_mask.shape
    K = spec_k
    cap = max_new + K          # generated-KV slots (block may overhang)
    prompt_len = jnp.sum(attn_mask, axis=1).astype(jnp.int32)   # (B,)

    last = prompt_len - 1
    h_last = jnp.take_along_axis(
        hidden, last[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    cur0 = jnp.argmax(_lm_logits(params, h_last),
                      axis=-1).astype(jnp.int32)

    caches = []
    for (k, v) in kvs:
        kc = jnp.concatenate(
            [jnp.broadcast_to(k, (b,) + k.shape[1:]),
             jnp.zeros((b, cap) + k.shape[2:], k.dtype)], axis=1)
        vc = jnp.concatenate(
            [jnp.broadcast_to(v, (b,) + v.shape[1:]),
             jnp.zeros((b, cap) + v.shape[2:], v.dtype)], axis=1)
        caches.append((kc, vc))

    params = prepare_decode_params(params)   # int4: unpack to s4 once
    tp = params["text"]
    emb = params["embed"]["embed_tokens"]["embedding"]
    out0 = jnp.full((b, max_new), pad_id, jnp.int32)
    jK = jnp.arange(K)
    rows = jnp.arange(b)[:, None]
    lh = p_len + max_new

    def cond(st):
        t, out, m, cur, done, caches = st
        return (t < max_new) & ~jnp.all(done)

    def body(st):
        t, out, m, cur, done, caches = st
        # ------- draft: n-gram continuation from [prompt, generated]
        hist = jnp.concatenate([input_ids, out], axis=1)   # (B, Lh)
        pos_h = jnp.arange(lh)
        valid = ((pos_h[None] < prompt_len[:, None])
                 | ((pos_h[None] >= p_len)
                    & (pos_h[None] < p_len + m[:, None])))
        # suffix to match: the last (ngram-1) emitted/prompt tokens
        # + cur (about to be emitted)
        gram = [cur]
        for j in range(1, ngram):
            # j-th token back: out[m-j], falling back into the prompt
            # tail when fewer than j tokens were generated
            gen_idx = jnp.clip(m - j, 0, max_new - 1)
            from_gen = jnp.take_along_axis(
                out, gen_idx[:, None], axis=1)[:, 0]
            pr_idx = jnp.clip(prompt_len - (j - m), 0, p_len - 1)
            from_pr = jnp.take_along_axis(
                input_ids, pr_idx[:, None], axis=1)[:, 0]
            gram.append(jnp.where(m >= j, from_gen, from_pr))
        prev_gram = jnp.stack(gram[::-1], axis=1)          # (B, ngram)
        draft, found = draft_lookup(hist, prev_gram, valid, K)
        draft = jnp.where(found[:, None], draft, pad_id)
        block = jnp.concatenate([cur[:, None], draft], axis=1)  # (B,K)

        # ------- verify forward over the K-token block
        x = emb[block].astype(dtype)
        posk = (next_pos + m)[:, None] + jK[None]          # (B, K)
        pos3 = jnp.broadcast_to(posk[None], (3, b, K))
        cos, sin = interleaved_mrope_cos_sin(pos3, c.text)
        gen_ok = (jnp.arange(cap)[None, None, :]
                  < (m[:, None] + jK[None] + 1)[:, :, None])
        mask = jnp.concatenate(
            [jnp.broadcast_to(attn_mask.astype(bool)[:, None, :],
                              (b, K, p_len)), gen_ok], axis=2)
        write_at = p_len + m[:, None] + jK[None]           # (B, K)
        new_caches = []
        for i in range(c.text.layers):
            kc, vc = caches[i]
            x, kc, vc = _decode_layer_block(
                tp[f"layer{i}"], c.text, x, cos, sin, kc, vc,
                write_at, mask)
            new_caches.append((kc, vc))
        h = _rms(x, tp["norm"]["scale"], c.text.rms_eps)
        g = jnp.argmax(_lm_logits(params, h),
                       axis=-1).astype(jnp.int32)          # (B, K)

        # ------- accept the longest draft prefix matching the argmax
        matches = (block[:, 1:] == g[:, :-1]).astype(jnp.int32)
        if force_reject:
            matches = jnp.zeros_like(matches)
        acc = jnp.cumprod(matches, axis=1).sum(axis=1)     # (B,)
        cnt = acc + 1
        iseos = (block == eos_id) & (jK[None] < cnt[:, None])
        has_eos = iseos.any(axis=1)
        cnt = jnp.where(has_eos, jnp.argmax(iseos, axis=1) + 1, cnt)
        cnt = jnp.minimum(cnt, max_new - m)
        cnt = jnp.where(done, 0, cnt)
        widx = jnp.where(jK[None] < cnt[:, None],
                         m[:, None] + jK[None], max_new)   # OOB = drop
        out = out.at[rows, widx].set(block, mode="drop")
        cur_new = jnp.take_along_axis(
            g, jnp.clip(cnt - 1, 0, K - 1)[:, None], axis=1)[:, 0]
        cur = jnp.where(cnt > 0, cur_new, cur)
        m = m + cnt
        done = done | has_eos | (m >= max_new)
        return (t + 1, out, m, cur, done, new_caches)

    t, out, m, cur, done, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), out0, jnp.zeros((b,), jnp.int32), cur0,
         jnp.zeros((b,), bool), caches))
    return out, t
