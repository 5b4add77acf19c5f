"""Weight-only int8 decode quantization (models/quant).

No reference counterpart (the reference serves generation through HF
``.generate()`` at full precision, wedetect_ref/models/
qwen3vl_grounding.py:311-379); the oracle is therefore internal:
the int8 path vs its own dequantized tree, and vs the full-precision
decode for accuracy.
"""

import numpy as np

import jax
import jax.numpy as jnp

from test_ref_generate import build_prompt, tiny_cfg
from wedetect_tpu.models.quant import (dequantize_decode_params,
                                       matmul_any, pack_int4,
                                       prepare_decode_params,
                                       quantize_decode_params,
                                       quantize_weight,
                                       quantize_weight4,
                                       quantized_bytes, unpack_int4)
from wedetect_tpu.models.ref import RefModules
from wedetect_tpu.models.ref_generate import _lm_logits, ref_generate


def test_quantize_roundtrip_bound():
    """absmax symmetric int8: elementwise error <= scale/2 and the
    per-channel max maps to +/-127 exactly."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 3.0
    q = quantize_weight(w, axis=0)
    assert q["w8"].dtype == jnp.int8 and q["w8"].shape == w.shape
    assert q["scale"].shape == (48,)
    deq = np.asarray(q["w8"], np.float32) * np.asarray(q["scale"])
    err = np.abs(w - deq)
    assert (err <= np.asarray(q["scale"]) / 2 + 1e-7).all()
    # the absmax entry of every column hits the clip boundary
    amax_rows = np.argmax(np.abs(w), axis=0)
    hit = np.abs(np.asarray(q["w8"])[amax_rows, np.arange(48)])
    np.testing.assert_array_equal(hit, np.full(48, 127))


def test_matmul_any_pow2_scale_bitwise():
    """With power-of-two scales, (y @ w8) * s == y @ (w8 * s) BITWISE
    (scaling by a power of two commutes with FP rounding), pinning
    that matmul_any computes exactly the advertised contraction."""
    rng = np.random.default_rng(1)
    w8 = rng.integers(-127, 128, (32, 24)).astype(np.int8)
    scale = (2.0 ** rng.integers(-8, 2, 24)).astype(np.float32)
    y = rng.standard_normal((5, 32)).astype(np.float32)
    leaf = {"w8": jnp.asarray(w8), "scale": jnp.asarray(scale)}
    got = np.asarray(matmul_any(jnp.asarray(y), leaf, jnp.float32))
    want = np.asarray(
        jnp.asarray(y) @ (leaf["w8"].astype(jnp.float32)
                          * leaf["scale"]))
    np.testing.assert_array_equal(got, want)
    # and the full-precision leaf branch is a plain matmul
    full = {"kernel": leaf["w8"].astype(jnp.float32) * leaf["scale"]}
    np.testing.assert_array_equal(
        np.asarray(matmul_any(jnp.asarray(y), full, jnp.float32)),
        want)


def test_pack_unpack_int4_roundtrip():
    """unpack(pack(q)) == q for every nibble value in both positions
    (incl. -8, the asymmetric code) and a random code matrix."""
    all16 = np.arange(-8, 8, dtype=np.int8)
    q = np.stack(np.meshgrid(all16, all16, indexing="ij"),
                 axis=0).reshape(2, -1).astype(np.int8)   # (2, 256)
    got = np.asarray(unpack_int4(pack_int4(jnp.asarray(q)))
                     .astype(jnp.int8))
    np.testing.assert_array_equal(got, q)
    rng = np.random.default_rng(7)
    q = rng.integers(-8, 8, (64, 48)).astype(np.int8)
    got = np.asarray(unpack_int4(pack_int4(jnp.asarray(q)))
                     .astype(jnp.int8))
    np.testing.assert_array_equal(got, q)


def test_quantize_weight4_bounds():
    """Rank-1 two-sided int4: codes never clip (every column's absmax
    maps to exactly +/-7) and elementwise error <= r_i * c_o / 14."""
    rng = np.random.default_rng(8)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 2.5
    # spike a few rows/columns so the rank-1 scaling has work to do
    w[3] *= 20.0
    w[:, 7] *= 15.0
    q = quantize_weight4(w, axis=0)
    assert q["w4p"].dtype == jnp.int8
    assert q["w4p"].shape == (32, 48)
    codes = np.asarray(unpack_int4(q["w4p"]).astype(jnp.int8))
    assert codes.min() >= -7 and codes.max() <= 7
    # every column's absmax entry hits the +/-7 boundary
    amax_rows = np.argmax(np.abs(w), axis=0)
    np.testing.assert_array_equal(
        np.abs(codes[amax_rows, np.arange(48)]), np.full(48, 7))
    r = np.asarray(q["rscale"])
    s = np.asarray(q["scale"])
    deq = r[:, None] * codes.astype(np.float32) * s[None, :]
    bound = r[:, None] * (s[None, :] * 7.0) / 14.0   # scale/2 per cell
    assert (np.abs(w - deq) <= bound + 1e-6).all()


def test_matmul_any_int4_pow2_scale_bitwise():
    """With power-of-two rscale and scale,
    ((y * r) @ q) * s == y @ (diag(r) q diag(s)) BITWISE (pow2 scaling
    commutes with FP rounding and factors exactly out of the sum),
    pinning the advertised two-sided contraction — through both the
    packed leaf ({w4p}: in-matmul unpack) and the prepared leaf
    ({w4}: the pre-unpacked s4 the decode scans stream)."""
    rng = np.random.default_rng(9)
    q = rng.integers(-7, 8, (32, 24)).astype(np.int8)
    r = (2.0 ** rng.integers(-4, 3, 32)).astype(np.float32)
    s = (2.0 ** rng.integers(-8, 2, 24)).astype(np.float32)
    y = rng.standard_normal((5, 32)).astype(np.float32)
    leaf = {"w4p": pack_int4(jnp.asarray(q)), "rscale": jnp.asarray(r),
            "scale": jnp.asarray(s)}
    want = np.asarray(
        jnp.asarray(y) @ jnp.asarray(r[:, None] * q * s[None, :]))
    got = np.asarray(matmul_any(jnp.asarray(y), leaf, jnp.float32))
    np.testing.assert_array_equal(got, want)
    prepped = jax.jit(lambda lf: dict(prepare_decode_params(lf)))(leaf)
    assert "w4" in prepped and prepped["w4"].dtype == jnp.int4
    got2 = np.asarray(matmul_any(jnp.asarray(y), prepped, jnp.float32))
    np.testing.assert_array_equal(got2, want)


def _tiny_model():
    cfg = tiny_cfg()
    gh = gw = 8
    rng = np.random.default_rng(2)
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    ids0, pos0 = build_prompt(cfg, gh, gw, 5, rng)
    ids = ids0[None]
    mask = np.ones((1, len(ids0)), np.int32)
    pos = pos0[:, None]
    boxes = np.array([[0, 0, 64, 64]], np.float32)
    ori = np.array([64.0, 64.0], np.float32)
    mod = RefModules(cfg, gh, gw)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), jnp.asarray(boxes),
        jnp.asarray(ori), 2, jnp.zeros((1, 1), jnp.int32))
    args = (cfg, gh, gw, variables["params"], jnp.asarray(patches),
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pos), 2,
            jnp.asarray(np.array([pos0.max() + 1], np.int32)),
            jnp.asarray(boxes), jnp.asarray(ori), 6)
    return cfg, mod, variables["params"], args, patches, ids, mask, \
        pos, boxes, ori


def test_quantized_tree_shape_and_size():
    """Every text-layer matmul + the (tied) LM head is int8; norms and
    the embedding table pass through; bytes ~= 1/4 of f32."""
    cfg, _, params, *_ = _tiny_model()
    q = quantize_decode_params(params)
    assert "lm_head" in q                      # tied head materialized
    assert q["lm_head"]["w8"].dtype == jnp.int8
    emb = params["embed"]["embed_tokens"]["embedding"]
    assert q["lm_head"]["w8"].shape == (emb.shape[1], emb.shape[0])
    for i in range(cfg.text.layers):
        layer = q["text"][f"layer{i}"]
        for k in ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj"):
            assert layer[k]["w8"].dtype == jnp.int8, (i, k)
        assert "scale" in layer["input_ln"]     # norm untouched
    f32_bytes = sum(
        p["kernel"].size * 4
        for i in range(cfg.text.layers)
        for n, p in params["text"][f"layer{i}"].items()
        if "kernel" in p) + emb.size * 4
    assert quantized_bytes({"text": q["text"], "lm_head": q["lm_head"]}) \
        < 0.45 * f32_bytes


def test_generate_int8_matches_dequantized_oracle():
    """Greedy tokens through the int8 decode equal the same decode run
    on the pre-dequantized tree (the mechanics oracle: identical math
    up to FP association, which a tiny model's argmax is insensitive
    to), and stay close to the full-precision decode (accuracy)."""
    cfg, mod, params, args, patches, ids, mask, pos, boxes, ori = \
        _tiny_model()
    q = quantize_decode_params(params)
    deq = dequantize_decode_params(q)

    full = np.asarray(ref_generate(*args, eos_id=95))
    int8 = np.asarray(ref_generate(*args, eos_id=95, decode_params=q))
    oracle = np.asarray(ref_generate(*args, eos_id=95,
                                     decode_params=deq))
    np.testing.assert_array_equal(int8, oracle)
    assert int8.shape == full.shape
    assert ((int8 >= 0) & (int8 < cfg.text.vocab_size)).all()

    # accuracy: first-step logits cosine vs full precision
    from wedetect_tpu.train.ref_lm import _hidden_states
    hidden = mod.apply(
        {"params": params}, jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), jnp.asarray(boxes),
        jnp.asarray(ori), 2, jnp.full((1, 1), -1, jnp.int32),
        method=_hidden_states)
    h_last = hidden[0, mask.sum() - 1]
    lf = np.asarray(_lm_logits(params, h_last))
    lq = np.asarray(_lm_logits(q, h_last))
    cos = float(np.dot(lf, lq)
                / (np.linalg.norm(lf) * np.linalg.norm(lq)))
    assert cos > 0.999, cos


def test_quantized_tree_int4_shape_and_size():
    """bits=4: every text-layer matmul + the tied LM head is a packed
    {w4p, rscale, scale} leaf; bytes ~< 1/8 of f32 + scales."""
    cfg, _, params, *_ = _tiny_model()
    q = quantize_decode_params(params, bits=4)
    emb = params["embed"]["embed_tokens"]["embedding"]
    assert q["lm_head"]["w4p"].dtype == jnp.int8
    assert q["lm_head"]["w4p"].shape == (emb.shape[1] // 2,
                                         emb.shape[0])
    assert q["lm_head"]["rscale"].shape == (emb.shape[1],)
    for i in range(cfg.text.layers):
        layer = q["text"][f"layer{i}"]
        for k in ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj"):
            assert layer[k]["w4p"].dtype == jnp.int8, (i, k)
        assert "scale" in layer["input_ln"]     # norm untouched
    q8 = quantize_decode_params(params, bits=8)
    tree8 = {"text": q8["text"], "lm_head": q8["lm_head"]}
    tree4 = {"text": q["text"], "lm_head": q["lm_head"]}
    assert quantized_bytes(tree4) < 0.62 * quantized_bytes(tree8)


def test_generate_int4_matches_dequantized_oracle():
    """Greedy tokens through the packed-int4 decode equal the same
    decode on the pre-dequantized tree (mechanics oracle), and the
    first-step logits stay directionally close to full precision
    (accuracy — int4 is lossier than int8 by design)."""
    cfg, mod, params, args, patches, ids, mask, pos, boxes, ori = \
        _tiny_model()
    q = quantize_decode_params(params, bits=4)
    deq = dequantize_decode_params(q)

    full = np.asarray(ref_generate(*args, eos_id=95))
    int4 = np.asarray(ref_generate(*args, eos_id=95, decode_params=q))
    oracle = np.asarray(ref_generate(*args, eos_id=95,
                                     decode_params=deq))
    np.testing.assert_array_equal(int4, oracle)
    assert int4.shape == full.shape
    assert ((int4 >= 0) & (int4 < cfg.text.vocab_size)).all()

    from wedetect_tpu.train.ref_lm import _hidden_states
    hidden = mod.apply(
        {"params": params}, jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), jnp.asarray(boxes),
        jnp.asarray(ori), 2, jnp.full((1, 1), -1, jnp.int32),
        method=_hidden_states)
    h_last = hidden[0, mask.sum() - 1]
    lf = np.asarray(_lm_logits(params, h_last))
    lq = np.asarray(_lm_logits(q, h_last))
    cos = float(np.dot(lf, lq)
                / (np.linalg.norm(lf) * np.linalg.norm(lq)))
    assert cos > 0.98, cos


def test_generate_int8_untied_head_bf16():
    """Untied lm_head is quantized too, and the int8 decode composes
    with the bf16 compute path."""
    cfg, _, params, args, *_ = _tiny_model()
    rng = np.random.default_rng(3)
    params = dict(params)
    params["lm_head"] = {"kernel": jnp.asarray(
        rng.standard_normal(
            (cfg.text.hidden, cfg.text.vocab_size)).astype(np.float32)
        * 0.1)}
    q = quantize_decode_params(params)
    assert q["lm_head"]["w8"].shape == (cfg.text.hidden,
                                        cfg.text.vocab_size)
    args = args[:3] + (params,) + args[4:]
    toks = np.asarray(ref_generate(*args, eos_id=95, decode_params=q,
                                   dtype=jnp.bfloat16))
    assert toks.shape == (1, 6)
    assert ((toks >= 0) & (toks < cfg.text.vocab_size)).all()

import pytest  # noqa: E402

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
