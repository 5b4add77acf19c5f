"""Agreement tests for the grouped-KV rectangular-causal Pallas flash
kernel (ops/flash_gqa.py) vs the exact einsum reference
(ops/attention._reference_attention with jnp.repeat for GQA).

Runs the REAL kernel code through the Pallas interpreter on CPU; the
compiled-on-chip agreement lives in tests/test_tpu_kernels.py behind
WEDETECT_TPU_TESTS=1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wedetect_tpu.ops.attention import _reference_attention
from wedetect_tpu.ops.flash_gqa import gqa_flash_attention, supports


def _ref(q, k, v, *, causal, kv_valid, sm_scale=None):
    g = q.shape[2] // k.shape[2]
    kr = jnp.repeat(k, g, axis=2)
    vr = jnp.repeat(v, g, axis=2)
    if sm_scale is None:
        sm_scale = 1.0 / np.sqrt(q.shape[-1])
    return _reference_attention(q, kr, vr, causal=causal,
                                kv_valid=kv_valid, sm_scale=sm_scale)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


CASES = [
    # (B, S, Lk, H, KVH, D, causal, masked)
    (2, 128, 384, 4, 2, 128, True, False),    # rectangular, G=2
    (1, 128, 128, 4, 1, 128, True, False),    # square causal, MHA
    (2, 128, 640, 8, 2, 128, True, True),     # G=4, mid-seq padding
    (1, 256, 256, 8, 8, 128, False, True),    # non-causal, pads
    (1, 128, 512, 16, 8, 128, True, True),    # 2B-shaped G=2
]


@pytest.mark.parametrize(
    "b,s,lk,h,kvh,d,causal,masked", CASES,
    ids=[f"B{c[0]}S{c[1]}L{c[2]}H{c[3]}KV{c[4]}"
         f"{'c' if c[6] else 'n'}{'m' if c[7] else ''}" for c in CASES])
def test_fwd_agreement(b, s, lk, h, kvh, d, causal, masked):
    rng = np.random.default_rng(b * 1000 + s + lk)
    q = _rand(rng, b, s, h, d)
    k = _rand(rng, b, lk, kvh, d)
    v = _rand(rng, b, lk, kvh, d)
    kv_valid = None
    if masked:
        m = np.ones((b, lk), np.int32)
        # invalidate a middle span (prefix right-padding) + the tail
        m[:, lk // 2 - 8:lk // 2] = 0
        m[:, -5:] = 0
        kv_valid = jnp.asarray(m)
    assert supports(s, lk, d, h // kvh)
    got = gqa_flash_attention(q, k, v, causal=causal,
                              kv_valid=kv_valid)
    want = _ref(q, k, v, causal=causal, kv_valid=kv_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("case", [0, 2], ids=["rect_g2", "rect_g4_m"])
def test_grad_agreement(case):
    b, s, lk, h, kvh, d, causal, masked = CASES[case]
    rng = np.random.default_rng(7 + case)
    q = _rand(rng, b, s, h, d)
    k = _rand(rng, b, lk, kvh, d)
    v = _rand(rng, b, lk, kvh, d)
    kv_valid = None
    if masked:
        m = np.ones((b, lk), np.int32)
        m[:, lk // 2 - 8:lk // 2] = 0
        kv_valid = jnp.asarray(m)
    w = _rand(rng, b, s, h, d)   # fixed cotangent direction

    def loss_flash(q, k, v):
        o = gqa_flash_attention(q, k, v, causal=causal,
                                kv_valid=kv_valid)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        o = _ref(q, k, v, causal=causal, kv_valid=kv_valid)
        return jnp.sum(o * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_grad_under_jit():
    b, s, lk, h, kvh, d = 1, 128, 256, 4, 2, 128
    rng = np.random.default_rng(11)
    q = _rand(rng, b, s, h, d)
    k = _rand(rng, b, lk, kvh, d)
    v = _rand(rng, b, lk, kvh, d)

    @jax.jit
    def f(q, k, v):
        return jnp.sum(gqa_flash_attention(q, k, v, causal=True) ** 2)

    g = jax.grad(f)(q, k, v)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_fwd():
    b, s, lk, h, kvh, d = 1, 128, 384, 4, 2, 128
    rng = np.random.default_rng(3)
    q = _rand(rng, b, s, h, d).astype(jnp.bfloat16)
    k = _rand(rng, b, lk, kvh, d).astype(jnp.bfloat16)
    v = _rand(rng, b, lk, kvh, d).astype(jnp.bfloat16)
    got = gqa_flash_attention(q, k, v, causal=True)
    assert got.dtype == jnp.bfloat16
    want = _ref(q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), causal=True, kv_valid=None)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want),
        atol=3e-2, rtol=3e-2)


def test_rejects_bad_shapes():
    q = jnp.zeros((1, 128, 4, 128))
    k = jnp.zeros((1, 200, 2, 128))   # Lk not 128-multiple
    with pytest.raises(ValueError):
        gqa_flash_attention(q, k, k, causal=True)
    k = jnp.zeros((1, 64, 2, 128))    # Lk < S causal
    with pytest.raises(ValueError):
        gqa_flash_attention(q, k, k, causal=True)
    q = jnp.zeros((1, 128, 3, 128))   # H not multiple of KVH
    k = jnp.zeros((1, 128, 2, 128))
    with pytest.raises(ValueError):
        gqa_flash_attention(q, k, k, causal=True)
