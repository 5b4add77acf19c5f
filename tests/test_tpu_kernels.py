"""On-chip kernel agreement tests (real TPU only).

Run with:  WEDETECT_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py

Skipped in the normal (CPU-forced) suite: the flash path only exists
on TPU, and these pin flash-vs-einsum agreement on hardware —
including the rectangular end-aligned causal used by the
prefix-sharing prefill. Padded query rows are EXCLUDED from the
comparison: the two impls intentionally differ there (segment-id
isolation vs key masking) and every caller discards them.

Tolerance note: on TPU, f32 matmuls default to bf16-based passes, so
BOTH impls sit ~2e-3 from a float64 oracle (verified); the agreement
threshold reflects that, it is not hiding a masking error.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wedetect_tpu.ops.attention import dot_product_attention

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real-TPU-only kernel tests (WEDETECT_TPU_TESTS=1)")


def _qkv(rng, b, lq, lk, h, d):
    q = jnp.asarray(rng.standard_normal((b, lq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lk, h, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_einsum_square(causal):
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, 2, 256, 256, 4, 128)
    valid = np.ones((2, 256), np.int32)
    valid[1, -19:] = 0
    vj = jnp.asarray(valid)
    e = np.asarray(dot_product_attention(q, k, v, causal=causal,
                                         kv_valid=vj, impl="einsum"))
    f = np.asarray(dot_product_attention(q, k, v, causal=causal,
                                         kv_valid=vj, impl="flash"))
    m = valid.astype(bool)
    assert np.abs(e - f)[m].max() < 2e-3


def test_flash_matches_einsum_rectangular_causal():
    rng = np.random.default_rng(1)
    p, s = 384, 256
    q, k, v = _qkv(rng, 2, s, p + s, 4, 128)
    valid = np.ones((2, p + s), np.int32)
    valid[0, p - 30:p] = 0        # prefix padding
    valid[1, -17:] = 0            # suffix padding
    vj = jnp.asarray(valid)
    e = np.asarray(dot_product_attention(q, k, v, causal=True,
                                         kv_valid=vj, impl="einsum"))
    f = np.asarray(dot_product_attention(q, k, v, causal=True,
                                         kv_valid=vj, impl="flash"))
    m = valid[:, p:].astype(bool)
    assert np.abs(e - f)[m].max() < 2e-3


def test_gqa_flash_matches_einsum_rectangular():
    """Native grouped-KV rectangular-causal kernel (ops/flash_gqa.py)
    vs repeat+einsum, compiled on chip, at the 2B prefill shape
    (G=2) with prefix+suffix padding."""
    from wedetect_tpu.ops.attention import gqa_attention

    rng = np.random.default_rng(2)
    p, s = 384, 256
    b, h, kvh, d = 2, 16, 8, 128
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, p + s, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, p + s, kvh, d)).astype(np.float32))
    valid = np.ones((b, p + s), np.int32)
    valid[0, p - 30:p] = 0
    valid[1, -17:] = 0
    vj = jnp.asarray(valid)
    e = np.asarray(gqa_attention(q, k, v, causal=True, kv_valid=vj,
                                 impl="einsum"))
    f = np.asarray(gqa_attention(q, k, v, causal=True, kv_valid=vj,
                                 impl="flash"))
    m = valid[:, p:].astype(bool)
    assert np.abs(e - f)[m].max() < 2e-3


def test_gqa_flash_grad_on_chip():
    """Custom-VJP backward kernels compile and agree with einsum
    grads on chip (square causal, G=4 — the SFT training shape)."""
    from wedetect_tpu.ops.attention import gqa_attention

    rng = np.random.default_rng(3)
    b, l, h, kvh, d = 1, 256, 8, 2, 128
    q = jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, kvh, d)).astype(np.float32))

    def loss(impl):
        def f(q, k, v):
            o = gqa_attention(q, k, v, causal=True, impl=impl)
            return jnp.sum(o ** 2)
        return f

    ge = jax.grad(loss("einsum"), argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, ge):
        scale = max(float(jnp.abs(jnp.asarray(b_)).max()), 1.0)
        assert float(jnp.abs(a - b_).max()) / scale < 5e-3
