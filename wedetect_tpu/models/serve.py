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

Greedy-only (temperature sampling lives in models/ref_generate; a
serving loop wanting it would thread an rng through the state tuple).
Decode numerics are the models/ref_generate ones (same param tree,
same ops/attention.gqa_attention) — tests/test_serve.py pins
token-exact agreement with ``ref_generate`` per request.
"""

from __future__ import annotations

import functools
import math
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from wedetect_tpu.models.quant import matmul_any
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


def _decode_layer_rowwise(p, c, x, cos, sin, cache_k, cache_v,
                          write_col, kv_valid):
    """One decoder layer, one token per row, PER-ROW cache depth.

    Twin of models/ref_generate._decode_layer except the KV write
    column is a (B,) vector (each slot is at its own depth) — a
    row-indexed scatter instead of a dynamic_update_slice — and
    kv_valid (B, C) is per-row rather than derived from a shared step
    counter."""
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
    cache_k = cache_k.at[rows, write_col].set(
        k[:, 0].astype(cache_k.dtype))
    cache_v = cache_v.at[rows, write_col].set(
        v[:, 0].astype(cache_v.dtype))
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


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 11),
                   donate_argnums=(6,))
def _admit(cfg: RefCfg, grid_h: int, grid_w: int, dtype, params,
           decode_params, state, slot, patches, input_ids, attn_mask,
           visual_start: int, position_ids, next_pos0, boxes_xyxy,
           ori_wh, object_positions):
    """Prefill ONE request and install it into slot ``slot``.

    input_ids/attn_mask (1, P); position_ids (3, 1, P); next_pos0 ()
    int32 first generated position; slot () int32 traced — one
    compile covers every slot. The first generated token is sampled
    here (from the decode/lm-head tree, matching ref_generate) and
    parked in cur_tok; the next _decode_chunk emits it."""
    from wedetect_tpu.models.ref import RefModules

    caches, prompt_mask, gen_count, next_pos, cur_tok, done = state
    mod = RefModules(cfg, grid_h, grid_w, dtype=dtype)
    hidden, kvs = mod.apply(
        {"params": params}, patches, input_ids, attn_mask,
        position_ids, boxes_xyxy, ori_wh, visual_start,
        object_positions, method=_prefill_hidden_kvs)
    last = jnp.sum(attn_mask[0]).astype(jnp.int32) - 1
    h_last = jax.lax.dynamic_index_in_dim(hidden[0], last, axis=0,
                                          keepdims=False)
    dp = params if decode_params is None else decode_params
    tok0 = jnp.argmax(_lm_logits(dp, h_last[None]),
                      axis=-1).astype(jnp.int32)[0]

    new_caches = []
    for (kc, vc), (k, v) in zip(caches, kvs):
        kc = jax.lax.dynamic_update_slice(
            kc, k.astype(kc.dtype), (slot, 0, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v.astype(vc.dtype), (slot, 0, 0, 0))
        new_caches.append((kc, vc))
    prompt_mask = jax.lax.dynamic_update_slice(
        prompt_mask, attn_mask.astype(jnp.int32), (slot, 0))
    gen_count = gen_count.at[slot].set(0)
    next_pos = next_pos.at[slot].set(next_pos0)
    cur_tok = cur_tok.at[slot].set(tok0)
    done = done.at[slot].set(False)
    return (tuple(new_caches), prompt_mask, gen_count, next_pos,
            cur_tok, done)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 11),
                   donate_argnums=(6,))
def _admit_many(cfg: RefCfg, grid_h: int, grid_w: int, dtype, params,
                decode_params, state, slots, patches, input_ids,
                attn_mask, visual_start: int, position_ids, next_pos0,
                boxes_xyxy, ori_wh, object_positions):
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

    caches, prompt_mask, gen_count, next_pos, cur_tok, done = state
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
    tok0 = jnp.argmax(_lm_logits(dp, h_last), axis=-1).astype(jnp.int32)

    n, p_len = attn_mask.shape
    rows = slots[:, None]
    cols = jnp.arange(p_len)[None, :]
    new_caches = []
    for (kc, vc), (k, v) in zip(caches, kvs):
        # k/v: (N, 1, P, KVH, HD) from the vmapped B=1 prefill
        kc = kc.at[rows, cols].set(k[:, 0].astype(kc.dtype))
        vc = vc.at[rows, cols].set(v[:, 0].astype(vc.dtype))
        new_caches.append((kc, vc))
    prompt_mask = prompt_mask.at[slots].set(
        attn_mask.astype(jnp.int32))
    gen_count = gen_count.at[slots].set(0)
    next_pos = next_pos.at[slots].set(next_pos0)
    cur_tok = cur_tok.at[slots].set(tok0)
    done = done.at[slots].set(False)
    return (tuple(new_caches), prompt_mask, gen_count, next_pos,
            cur_tok, done)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   donate_argnums=(6,))
def _decode_chunk(cfg: RefCfg, chunk: int, eos_id: int, pad_id: int,
                  dtype, params, state):
    """T lockstep single-token steps across all slots; returns
    ((B, T) emitted tokens, new state). Emission order matches
    ref_generate: each step emits the carried token (pad for done /
    empty rows), marks done on eos, then computes the next token."""
    caches, prompt_mask, gen_count, next_pos, cur_tok, done = state
    c = cfg.text
    b, p_len = prompt_mask.shape
    g_cap = caches[0][0].shape[1] - p_len
    tp = params["text"]
    emb = params["embed"]["embed_tokens"]["embedding"]
    gen_cols = jnp.arange(g_cap, dtype=jnp.int32)

    def body(carry, _):
        caches, gen_count, next_pos, cur_tok, done = carry
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
        nxt = jnp.argmax(_lm_logits(params, h),
                         axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cur_tok, nxt)
        gen_count = gen_count + 1
        next_pos = next_pos + 1
        return (tuple(new_caches), gen_count, next_pos, nxt, done), \
            emitted

    (caches, gen_count, next_pos, cur_tok, done), toks = jax.lax.scan(
        body, (caches, gen_count, next_pos, cur_tok, done),
        jnp.arange(chunk, dtype=jnp.int32))
    state = (caches, prompt_mask, gen_count, next_pos, cur_tok, done)
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

    ``batch_admit=True`` admits shape-compatible waves through ONE
    vmapped prefill (_admit_many) instead of per-request prefills.
    Default OFF: measured on the v5e (PERF.md round-4 serving
    section), the pipelined run already hides admit dispatch latency
    and b=1 384-token prefills already saturate the MXU, so batching
    bought nothing and the vmapped lanes cost ~7% — kept as an option
    for deployments with many tiny prompts where b=1 prefill is
    launch-bound.
    """

    def __init__(self, cfg: RefCfg, grid_h: int, grid_w: int, params,
                 *, slots: int = 8, prompt_len: int, max_new: int,
                 chunk: int = 16, eos_id: int, pad_id: int = 0,
                 dtype=jnp.float32, decode_params=None,
                 batch_admit: bool = False):
        assert chunk >= 1 and max_new >= 1 and slots >= 1
        self.batch_admit = batch_admit
        self.cfg, self.gh, self.gw = cfg, grid_h, grid_w
        self.params = params
        self.decode_params = decode_params
        self.slots, self.P, self.G = slots, prompt_len, max_new
        self.chunk = chunk
        self.eos_id, self.pad_id = eos_id, pad_id
        self.dtype = dtype
        c = cfg.text
        cap = prompt_len + max_new
        caches = tuple(
            (jnp.zeros((slots, cap, c.kv_heads, c.head_dim), dtype),
             jnp.zeros((slots, cap, c.kv_heads, c.head_dim), dtype))
            for _ in range(c.layers))
        self._state = (
            caches,
            jnp.zeros((slots, prompt_len), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.full((slots,), pad_id, jnp.int32),
            jnp.ones((slots,), bool))
        self._queue = deque()
        self._live = {}            # slot -> req id
        self._buf = {}             # req id -> [tokens]
        self._out = {}             # req id -> np.ndarray (finished)
        self._next_id = 0
        # scheduling counters for the PERF.md gap accounting:
        # chunks * chunk * slots = decode slot-steps issued; delivered
        # tokens / slot-steps = occupancy (the rest is slot idle +
        # post-EOS waste); admits = prefill forwards
        self.stats = {"chunks": 0, "admits": 0}

    def submit(self, patches, input_ids, attn_mask, position_ids,
               visual_start: int, next_pos0: int, boxes_xyxy=None,
               ori_wh=None, object_positions=None) -> int:
        """Queue one request. input_ids/attn_mask (P,) or (1, P);
        position_ids (3, P) or (3, 1, P). boxes/object_positions as in
        ref_generate (None = caption-only dummy). Returns a request id
        resolved by step()/run()."""
        ids = np.asarray(input_ids, np.int32).reshape(1, self.P)
        mask = np.asarray(attn_mask, np.int32).reshape(1, self.P)
        pos = np.asarray(position_ids, np.int32).reshape(3, 1, self.P)
        if boxes_xyxy is None:
            boxes_xyxy = np.array([[0, 0, 10, 10]], np.float32)
        if ori_wh is None:
            ori_wh = np.array([10.0, 10.0], np.float32)
        if object_positions is None:
            object_positions = np.full((1, 1), -1, np.int32)
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, patches, ids, mask, pos,
                            int(visual_start), int(next_pos0),
                            boxes_xyxy, ori_wh, object_positions))
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
                 objp) = items[0]
                self._state = _admit(
                    self.cfg, self.gh, self.gw, self.dtype,
                    self.params, self.decode_params, self._state,
                    jnp.asarray(slots_n[0], jnp.int32),
                    jnp.asarray(patches), jnp.asarray(ids),
                    jnp.asarray(mask), vs, jnp.asarray(pos),
                    jnp.asarray(np0, jnp.int32), jnp.asarray(boxes),
                    jnp.asarray(ori), jnp.asarray(objp))
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
                                          for it in lanes])))
                for slot, it in zip(slots_n, items):
                    self._live[slot] = it[0]
                self.stats["admit_batches"] = \
                    self.stats.get("admit_batches", 0) + 1
            self.stats["admits"] += n

    def _dispatch_chunk(self):
        """Dispatch one decode chunk (async); returns the device
        tokens array and the slot->rid mapping as of this chunk."""
        dp = (self.params if self.decode_params is None
              else self.decode_params)
        toks, self._state = _decode_chunk(
            self.cfg, self.chunk, self.eos_id, self.pad_id,
            self.dtype, dp, self._state)
        self.stats["chunks"] += 1
        return toks, dict(self._live)

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
            hit_end = False
            for t in toks[slot]:
                t = int(t)
                if t == self.eos_id or t == self.pad_id \
                        or len(buf) >= self.G:
                    hit_end = True
                    break
                buf.append(t)
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
                nxt = None
                if self._queue or self._live:
                    self._admit_queued()
                    nxt = self._dispatch_chunk()
                if pending is not None:
                    self._collect(*pending)
                pending = nxt
        out, self._out = self._out, {}
        return out
