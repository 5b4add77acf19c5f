"""Attention dispatch semantics (CPU fallback path).

The flash kernel itself is TPU-only; its numerics vs this fallback are
verified on hardware by scripts/tpu_checks.py. Here we pin the contract
the two implementations share: padding via kv_valid is exact for real
rows, causal masking matches, gradients flow.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wedetect_tpu.ops.attention import _pick_block, dot_product_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_causal_matches_manual(rng):
    b, l, h, d = 2, 16, 4, 8
    q, k, v = (_rand(rng, b, l, h, d) for _ in range(3))
    out = dot_product_attention(q, k, v, causal=True, impl="einsum")
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    mask = jnp.tril(jnp.ones((l, l), bool))
    logits = jnp.where(mask[None, None], logits, -1e9)
    want = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_padding_exact_on_real_rows(rng):
    """Right padding + kv_valid == unpadded result on the real rows."""
    b, l, h, d, pad = 2, 12, 2, 8, 6
    q, k, v = (_rand(rng, b, l, h, d) for _ in range(3))
    for causal in (False, True):
        want = dot_product_attention(q, k, v, causal=causal,
                                     impl="einsum")
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        valid = jnp.asarray(
            np.repeat((np.arange(l + pad) < l)[None], b, 0), jnp.int32)
        got = dot_product_attention(qp, kp, vp, causal=causal,
                                    kv_valid=valid, impl="einsum")
        np.testing.assert_allclose(np.asarray(got[:, :l]),
                                   np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_grad_flows(rng):
    q, k, v = (_rand(rng, 1, 8, 2, 4) for _ in range(3))

    def f(q):
        return dot_product_attention(q, k, v, causal=True,
                                     impl="einsum").sum()

    g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_pick_block():
    assert _pick_block(4096) == 512
    assert _pick_block(1280) == 256
    assert _pick_block(96) is None
    assert _pick_block(1200) is None
