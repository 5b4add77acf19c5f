"""int8 KV cache for the serving engine (models/serve kv_bits=8).

No reference counterpart (the reference has no serving loop); the
oracles are internal: the scale-folded attention must match the exact
einsum attention on the dequantized cache (the folding is algebra,
not approximation — only the 8-bit CODE loses information), the
engine must stay scheduling-invariant under quantization, and the
pool must actually shrink.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_serve import _trim, build_prompt, tiny_cfg
from wedetect_tpu.models.ref import RefModules
from wedetect_tpu.models.serve import (GenServer, _gqa_int8kv,
                                       _kv_quant)
from wedetect_tpu.ops.attention import gqa_attention


def test_kv_quant_roundtrip_bound():
    """Per-(token, head) absmax int8: elementwise error <= s/2, the
    absmax entry of every vector maps to +/-127."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 7, 2, 16)).astype(np.float32) * 2.5
    q8, s = _kv_quant(jnp.asarray(x))
    q8, s = np.asarray(q8), np.asarray(s)
    assert q8.dtype == np.int8 and s.shape == (3, 7, 2)
    deq = q8.astype(np.float32) * s[..., None]
    assert (np.abs(x - deq) <= s[..., None] / 2 + 1e-7).all()
    amax = np.argmax(np.abs(x), axis=-1)
    hit = np.take_along_axis(np.abs(q8), amax[..., None], -1)
    np.testing.assert_array_equal(hit, np.full_like(hit, 127))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gqa_int8kv_matches_dequantized_einsum(dtype):
    """The rank-1 scale folding is EXACT given the codes: attention
    over the int8 cache equals the reference einsum attention over
    the dequantized cache (up to dot reassociation)."""
    rng = np.random.default_rng(1)
    b, c, kvh, hd, h = 4, 12, 2, 16, 4
    q = jnp.asarray(rng.standard_normal((b, 1, h, hd)), dtype)
    kc_q8 = jnp.asarray(rng.integers(-127, 128, (b, c, kvh, hd)),
                        jnp.int8)
    vc_q8 = jnp.asarray(rng.integers(-127, 128, (b, c, kvh, hd)),
                        jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.05, (b, c, kvh)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.05, (b, c, kvh)),
                     jnp.float32)
    kv_valid = jnp.asarray(np.where(
        np.arange(c)[None] <= rng.integers(3, c, (b, 1)), 1, 0
    ).astype(np.int32))
    kc = {"q8": kc_q8, "s": ks}
    vc = {"q8": vc_q8, "s": vs}
    got = np.asarray(_gqa_int8kv(q, kc, vc, kv_valid,
                                 1.0 / np.sqrt(hd)),
                     np.float32).reshape(b, 1, h, hd)
    deq_k = (kc_q8.astype(dtype)
             * ks[..., None].astype(dtype))
    deq_v = (vc_q8.astype(dtype)
             * vs[..., None].astype(dtype))
    want = np.asarray(gqa_attention(
        q, deq_k, deq_v, causal=False, kv_valid=kv_valid,
        sm_scale=1.0 / np.sqrt(hd), impl="einsum"), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def _tiny_server_setup():
    cfg = tiny_cfg()
    gh = gw = 8
    rng = np.random.default_rng(7)
    eos, pad, max_new, p_pad = 95, 0, 6, 32
    ids0, pos0 = build_prompt(cfg, gh, gw, 5, rng)
    patches0 = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    boxes = np.array([[0, 0, 10, 10]], np.float32)
    ori = np.array([10.0, 10.0], np.float32)
    mod = RefModules(cfg, gh, gw)
    params = mod.init(
        jax.random.PRNGKey(3), jnp.asarray(patches0),
        jnp.asarray(ids0[None]), jnp.asarray(np.ones_like(ids0)[None]),
        jnp.asarray(pos0[:, None]), jnp.asarray(boxes),
        jnp.asarray(ori), 2, jnp.full((1, 1), -1, jnp.int32))["params"]
    reqs = []
    for r in range(4):
        ids_r, pos_r = build_prompt(cfg, gh, gw, 3 + r, rng)
        patches_r = rng.standard_normal(
            (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
        ids = np.zeros(p_pad, np.int32)
        ids[:len(ids_r)] = ids_r
        mask = np.zeros(p_pad, np.int32)
        mask[:len(ids_r)] = 1
        pos = np.zeros((3, p_pad), np.int32)
        pos[:, :len(ids_r)] = pos_r
        reqs.append((patches_r, ids, mask, pos, int(pos_r.max()) + 1))
    return cfg, gh, gw, params, reqs, eos, pad, max_new, p_pad


@pytest.mark.slow
def test_server_kv8_scheduling_invariant_and_complete():
    """kv_bits=8 streams are a pure function of the request: slot
    count, chunk size, and admission order never change a request's
    tokens (the same invariance the bf16 engine pins), and every
    request completes with in-vocabulary tokens."""
    cfg, gh, gw, params, reqs, eos, pad, max_new, p_pad = \
        _tiny_server_setup()

    def run(slots, chunk, order):
        srv = GenServer(cfg, gh, gw, params, slots=slots,
                        prompt_len=p_pad, max_new=max_new, chunk=chunk,
                        eos_id=eos, pad_id=pad, kv_bits=8)
        rids = {}
        for r in order:
            patches_r, ids, mask, pos, np0 = reqs[r]
            rids[r] = srv.submit(patches_r, ids, mask, pos, 2, np0)
        out = srv.run()
        return {r: _trim(out[rid], eos, pad)
                for r, rid in rids.items()}

    a = run(2, 3, [0, 1, 2, 3])
    b = run(4, 2, [3, 1, 0, 2])
    c = run(1, 5, [2, 0, 3, 1])
    assert a == b == c
    for toks in a.values():
        assert all(0 <= t < cfg.text.vocab_size for t in toks)


@pytest.mark.slow
def test_server_kv8_agrees_with_bf16_cache():
    """On the tiny model the 8-bit code error (<0.5%) is far below
    the logit gaps, so kv_bits=8 greedy tokens match the bf16-cache
    engine's exactly here. (A real checkpoint must be gated per
    deployment — same policy as weight-only int8/int4.)"""
    cfg, gh, gw, params, reqs, eos, pad, max_new, p_pad = \
        _tiny_server_setup()

    def run(kv_bits):
        srv = GenServer(cfg, gh, gw, params, slots=2,
                        prompt_len=p_pad, max_new=max_new, chunk=3,
                        eos_id=eos, pad_id=pad, kv_bits=kv_bits)
        rids = [srv.submit(p_, i_, m_, po_, 2, np0)
                for p_, i_, m_, po_, np0 in reqs]
        out = srv.run()
        return [_trim(out[rid], eos, pad) for rid in rids]

    assert run(8) == run(16)


@pytest.mark.slow
def test_server_kv8_pool_memory_and_compose():
    """The int8 pool is ~0.52x the f32 pool bytes / ~1.03x bf16 /
    half of bf16... concretely: codes are 1 byte vs 2 (bf16) with a
    1/16-per-head scale overhead -> <0.6x; and kv_bits=8 composes
    with weight-only int8 decode params."""
    from wedetect_tpu.models.quant import quantize_decode_params

    cfg, gh, gw, params, reqs, eos, pad, max_new, p_pad = \
        _tiny_server_setup()

    def pool_bytes(srv):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(srv._state[0]))

    srv16 = GenServer(cfg, gh, gw, params, slots=2, prompt_len=p_pad,
                      max_new=max_new, chunk=3, eos_id=eos, pad_id=pad,
                      dtype=jnp.bfloat16)
    srv8 = GenServer(cfg, gh, gw, params, slots=2, prompt_len=p_pad,
                     max_new=max_new, chunk=3, eos_id=eos, pad_id=pad,
                     dtype=jnp.bfloat16, kv_bits=8,
                     decode_params=quantize_decode_params(params))
    assert pool_bytes(srv8) < 0.65 * pool_bytes(srv16)

    patches_r, ids, mask, pos, np0 = reqs[0]
    rid = srv8.submit(patches_r, ids, mask, pos, 2, np0)
    out = srv8.run()
    toks = _trim(out[rid], eos, pad)
    assert all(0 <= t < cfg.text.vocab_size for t in toks)

    with pytest.raises(AssertionError):
        GenServer(cfg, gh, gw, params, slots=2, prompt_len=p_pad,
                  max_new=max_new, chunk=3, eos_id=eos, pad_id=pad,
                  kv_bits=8, piggyback=True)
    with pytest.raises(AssertionError):
        GenServer(cfg, gh, gw, params, slots=2, prompt_len=p_pad,
                  max_new=max_new, chunk=3, eos_id=eos, pad_id=pad,
                  kv_bits=4)
