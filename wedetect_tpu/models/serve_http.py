"""HTTP front-end for the continuous-batching generation engine.

The reference framework ships no serving surface at all (its
generation twin inherits HF ``.generate`` behind offline eval scripts,
/root/reference/wedetect_ref/models/qwen3vl_grounding.py:311-379);
this module turns models/serve.GenServer into a long-lived network
service — the deployment shape a production VLM actually runs as.

Design, TPU-first:

- **One engine thread owns the device.** Every jax call (prefill
  admission, decode-chunk dispatch, token readbacks) happens on a
  single thread driving ``GenServer.pump()`` — the pipelined
  one-turn scheduler — so the single-process-per-chip rule (NOTES.md)
  and jit dispatch ordering are preserved no matter how many HTTP
  handler threads are in flight. Handler threads do host-only work:
  decode the image (data/vision_process.fetch_image: path / bytes /
  base64 / data: URI / http URL), tokenize, assemble the padded
  prompt (RefScorer._build_gen_prompt), enqueue, and block on a
  per-request event until the engine resolves it.
- **Static-shape pools.** GenServer compiles per (image grid bucket,
  prompt-length bucket, visual_start); the service keeps one server
  per such key, created on demand and capped at ``max_pools`` (each
  pool preallocates a slots x (P + max_new) KV cache in HBM — at 2B
  bf16, one 8-slot P=384 pool is ~0.5 GB). Images snap to the
  scorer's grid_buckets and prompts to ``prompt_buckets``, so a
  deployment that pins one bucket each reuses exactly one compiled
  engine forever. Idle pools are evicted LRU when the cap is hit.
- **Continuous batching across requests.** The engine loop round-
  robins ``pump()`` over pools with live work: each turn admits
  queued requests into free slots, dispatches one decode chunk
  asynchronously, and collects the PREVIOUS turn's tokens — the
  pipelined overlap that keeps the device busy through 30-200 ms
  transport round trips (PERF.md "Serving engine round 4"). When no
  pool has work the loop blocks on the inbox; arrival latency is one
  queue wake-up, not a poll interval.

Scheduling-invariant sampling (temperature / top_k / top_p with
per-request seeds) and weight-only int8/int4 decode compose through
the underlying GenServer unchanged. Tokens for the same request and
seed are identical whether served here, via GenServer.run(), or — at
bf16/int8 — via the static ref_generate path (near-tie caveat at
int4: models/quant docstring).

No reference counterpart; the HTTP protocol is a minimal JSON POST
(cli/serve_http.py documents the schema).
"""

from __future__ import annotations

import queue
import threading
import time

import numpy as np

__all__ = ["GenService", "Result"]


class Result:
    """Completion handle returned by GenService.submit()."""

    def __init__(self):
        self._event = threading.Event()
        self.tokens: np.ndarray | None = None
        self.text: str | None = None
        self.error: str | None = None

    def wait(self, timeout: float | None = None) -> bool:
        return self._event.wait(timeout)

    def _resolve(self, tokens, text):
        self.tokens, self.text = tokens, text
        self._event.set()

    def _fail(self, error: str):
        self.error = error
        self._event.set()


class _Pool:
    """One compiled GenServer + its in-flight bookkeeping."""

    def __init__(self, srv):
        self.srv = srv
        self.pending = None          # pump() pipeline carry
        self.results = {}            # rid -> (Result, max_new cap)
        self.last_used = time.monotonic()

    @property
    def active(self):
        return self.srv.busy or self.pending is not None


class GenService:
    """Thread-safe generation service over RefScorer + GenServer.

    ``submit()`` may be called from any thread (the HTTP handlers);
    all device work runs on the internal engine thread. ``scorer``
    supplies the tokenizer, vision preprocessing, grid buckets,
    dtype, and (optional) weight-only decode tree."""

    def __init__(self, scorer, *, slots: int = 8, chunk: int = 8,
                 max_new: int = 128,
                 prompt_buckets=(256, 384, 512),
                 max_pools: int = 2,
                 eos_token_id: int = 151645,
                 pad_token_id: int = 151643,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0):
        self.scorer = scorer
        self.slots, self.chunk, self.max_new = slots, chunk, max_new
        self.prompt_buckets = tuple(sorted(prompt_buckets))
        self.max_pools = max_pools
        self.eos_id, self.pad_id = eos_token_id, pad_token_id
        self.sampling = (temperature, top_k, top_p)
        if scorer.quantize_decode and scorer._decode_params is None:
            from wedetect_tpu.models.quant import quantize_decode_params
            bits = 4 if scorer.quantize_decode == "int4" else 8
            scorer._decode_params = quantize_decode_params(
                scorer.params, bits=bits)
        self._inbox: queue.Queue = queue.Queue()
        self._pools: dict = {}       # (gh, gw, vs, p_pad) -> _Pool
        self._stop = threading.Event()
        self._served = 0
        self._thread = threading.Thread(target=self._loop,
                                        name="gen-engine", daemon=True)
        self._thread.start()

    # ---------------------------------------------------- client side

    def submit(self, image, prompt: str, max_new_tokens: int = 0,
               seed: int | None = None) -> Result:
        """Host-only prompt assembly + enqueue; returns a Result the
        caller waits on. Raises ValueError when the prompt exceeds the
        largest bucket (the engine's compiled shapes are static)."""
        if self._stop.is_set():
            raise RuntimeError("service stopped")
        built = self.scorer._build_gen_prompt(
            np.asarray(image), prompt, self.pad_id)
        patches, gh, gw, ids, mask, pos, vs, w, h = built
        p_real = int(mask.sum())
        p_pad = next((b for b in self.prompt_buckets if b >= p_real),
                     None)
        if p_pad is None:
            raise ValueError(
                f"prompt is {p_real} tokens; largest bucket is "
                f"{self.prompt_buckets[-1]}")
        pad = p_pad - len(ids)
        if pad > 0:
            ids = np.pad(ids, (0, pad), constant_values=self.pad_id)
            mask = np.pad(mask, (0, pad))
            pos = np.pad(pos, ((0, 0), (0, pad)))
        else:
            ids, mask, pos = ids[:p_pad], mask[:p_pad], pos[:, :p_pad]
        cap = min(max_new_tokens, self.max_new) if max_new_tokens \
            else self.max_new
        res = Result()
        self._inbox.put(((gh, gw, vs, p_pad),
                         (patches, ids, mask, pos, vs, w, h),
                         cap, seed, res))
        return res

    def generate(self, image, prompt: str, max_new_tokens: int = 0,
                 seed: int | None = None,
                 timeout: float | None = None):
        """Blocking convenience wrapper: submit + wait + return text."""
        res = self.submit(image, prompt, max_new_tokens, seed)
        if not res.wait(timeout):
            raise TimeoutError("generation timed out")
        if res.error:
            raise RuntimeError(res.error)
        return res.text

    def stats(self) -> dict:
        pools = {
            f"{gh}x{gw}/P{p_pad}": dict(srv.stats, active=pool.active)
            for (gh, gw, _vs, p_pad), pool in list(self._pools.items())
            for srv in (pool.srv,)}
        return {"served": self._served, "queued": self._inbox.qsize(),
                "pools": pools}

    def shutdown(self, timeout: float = 30.0):
        """Stop the engine thread after draining in-flight work."""
        self._stop.set()
        self._inbox.put(None)                  # wake the idle wait
        self._thread.join(timeout)

    # ---------------------------------------------------- engine side

    def _get_pool(self, key) -> _Pool:
        pool = self._pools.get(key)
        if pool is None:
            if len(self._pools) >= self.max_pools:
                idle = [(p.last_used, k) for k, p in
                        self._pools.items() if not p.active]
                if idle:                       # LRU-evict an idle pool
                    del self._pools[min(idle)[1]]
            from wedetect_tpu.models.serve import GenServer

            gh, gw, _vs, p_pad = key
            t, k, p = self.sampling
            pool = _Pool(GenServer(
                self.scorer.cfg, gh, gw, self.scorer.params,
                slots=self.slots, prompt_len=p_pad,
                max_new=self.max_new, chunk=self.chunk,
                eos_id=self.eos_id, pad_id=self.pad_id,
                dtype=self.scorer._jnp_dtype(),
                decode_params=self.scorer._decode_params,
                temperature=t, top_k=k, top_p=p))
            self._pools[key] = pool
        return pool

    def _admit(self, item):
        import jax.numpy as jnp

        key, (patches, ids, mask, pos, vs, w, h), cap, seed, res = item
        try:
            pool = self._get_pool(key)
            srv = pool.srv
            next_pos0 = int(pos[:, mask.astype(bool)].max()) + 1
            rid = srv.submit(
                jnp.asarray(patches), ids, mask, pos, vs, next_pos0,
                boxes_xyxy=np.array([[0, 0, w, h]], np.float32),
                ori_wh=np.array([w, h], np.float32), seed=seed)
            pool.results[rid] = (res, cap)
            pool.last_used = time.monotonic()
        except Exception as e:                  # resolve, don't wedge
            res._fail(f"{type(e).__name__}: {e}")

    def _resolve(self, pool: _Pool, finished: dict):
        tok = self.scorer.tokenizer
        for rid, toks in finished.items():
            res, cap = pool.results.pop(rid, (None, None))
            if res is None:
                continue
            toks = np.asarray(toks[:cap], np.int32)
            text = (tok.decode([int(t) for t in toks])
                    if hasattr(tok, "decode") else None)
            res._resolve(toks, text)
            self._served += 1

    def _loop(self):
        while True:
            busy = any(p.active for p in self._pools.values())
            try:
                # block only when fully idle; otherwise just drain
                item = self._inbox.get(
                    block=not busy, timeout=None if busy else 0.25)
                while True:
                    if item is not None:
                        self._admit(item)
                    item = self._inbox.get_nowait()
            except queue.Empty:
                pass
            if self._stop.is_set() and self._inbox.empty() and \
                    not any(p.active for p in self._pools.values()):
                return
            for pool in list(self._pools.values()):
                if pool.active:
                    pool.pending, finished = pool.srv.pump(pool.pending)
                    self._resolve(pool, finished)
