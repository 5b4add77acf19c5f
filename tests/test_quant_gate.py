"""int4 calibration + quality gate (models/quant_calib,
eval/quant_gate, cli/quant_gate).

No reference counterpart (the reference ships no quantization); the
oracles are internal: the calibrated fit must never lose to the plain
fit under its own activation-weighted metric (alpha=0/beta=1 is in the
search space), the stats collector must reproduce a hand-computed
masked RMS, and the gate must report exactly what its probes measure.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from wedetect_tpu.models.quant import (dequantize_decode_params,
                                       pack_int4, quantize_weight4,
                                       unpack_int4)


def _weighted_mse(w, leaf, a):
    codes = np.asarray(unpack_int4(leaf["w4p"]).astype(jnp.int8),
                       np.float32)
    deq = (np.asarray(leaf["rscale"])[:, None] * codes
           * np.asarray(leaf["scale"])[None, :])
    return float((np.square(w - deq) * (a * a)[:, None]).sum())


def test_calibrated_leaf_format_and_bounds():
    """Same leaf keys/shapes/dtypes as the plain fit; codes in
    [-7, 7]."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 40)).astype(np.float32)
    a = rng.uniform(0.1, 4.0, 64).astype(np.float32)
    q = quantize_weight4(w, act_rms=a)
    qp = quantize_weight4(w)
    for k in ("w4p", "rscale", "scale"):
        assert q[k].shape == qp[k].shape and q[k].dtype == qp[k].dtype
    codes = np.asarray(unpack_int4(q["w4p"]).astype(jnp.int8))
    assert codes.min() >= -7 and codes.max() <= 7


def test_calibrated_never_worse_weighted_mse():
    """alpha=0/beta=1 (the plain fit) is in the search space, so the
    calibrated fit is <= the plain fit under the weighted metric —
    checked across several regimes, incl. uniform activations."""
    rng = np.random.default_rng(1)
    for trial in range(5):
        w = rng.standard_normal((32, 24)).astype(np.float32)
        if trial % 2:
            w[rng.integers(0, 32, 3)] *= 10.0        # weight outliers
        a = (np.ones(32, np.float32) if trial == 0
             else rng.lognormal(0, 1.0, 32).astype(np.float32))
        plain = quantize_weight4(w)
        calib = quantize_weight4(w, act_rms=a)
        assert _weighted_mse(w, calib, a) \
            <= _weighted_mse(w, plain, a) + 1e-6, trial


def test_calibrated_beats_plain_on_outlier_channels():
    """The motivating case: a few channels carry big activations AND a
    weight outlier sits elsewhere — clipping the outlier buys a finer
    grid for the channels that matter. Strict improvement expected."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    w[7] *= 50.0                       # weight outlier row
    a = np.full(64, 0.05, np.float32)
    a[:8] = 10.0                       # hot activation channels
    a[7] = 0.01                        # ... but NOT the outlier row
    plain = quantize_weight4(w)
    calib = quantize_weight4(w, act_rms=a)
    assert _weighted_mse(w, calib, a) < 0.9 * _weighted_mse(w, plain, a)


def test_calibrated_uniform_noclip_equals_plain():
    """With uniform activations and the clip search disabled
    (clip_grid=(1.0,)), the calibrated fit IS the plain fit — the
    alpha re-weighting collapses (all alphas agree at uniform a) and
    no column may clip, so the leaves must match exactly."""
    rng = np.random.default_rng(3)
    w = (rng.uniform(0.5, 1.0, (16, 12))
         * rng.choice([-1.0, 1.0], (16, 12))).astype(np.float32)
    plain = quantize_weight4(w)
    calib = quantize_weight4(w, act_rms=np.ones(16, np.float32),
                             clip_grid=(1.0,))
    np.testing.assert_array_equal(np.asarray(calib["w4p"]),
                                  np.asarray(plain["w4p"]))
    np.testing.assert_allclose(np.asarray(calib["scale"]),
                               np.asarray(plain["scale"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(calib["rscale"]),
                               np.asarray(plain["rscale"]), rtol=1e-6)


def test_calibrated_column_chunking_invariant():
    """The column-chunked search must be chunk-size invariant."""
    from wedetect_tpu.models.quant import _fit_int4_calibrated

    rng = np.random.default_rng(4)
    w = rng.standard_normal((32, 40)).astype(np.float32)
    w[:, 5] *= 20.0
    a = rng.lognormal(0, 1, 32).astype(np.float32)
    q1 = _fit_int4_calibrated(w, a, 2, (0.0, 0.25, 0.5),
                              (1.0, 0.9, 0.8), col_chunk=7)
    q2 = _fit_int4_calibrated(w, a, 2, (0.0, 0.25, 0.5),
                              (1.0, 0.9, 0.8), col_chunk=4096)
    np.testing.assert_array_equal(np.asarray(q1["w4p"]),
                                  np.asarray(q2["w4p"]))
    np.testing.assert_array_equal(np.asarray(q1["scale"]),
                                  np.asarray(q2["scale"]))


# ---- model-level tests (tiny RefModules) -------------------------------

@pytest.fixture(scope="module")
def tiny():
    from wedetect_tpu.cli.quant_gate import _random_setup

    return _random_setup(seed=0, n_prompts=4, n_calib=6)


@pytest.mark.slow
def test_collect_act_rms_tree(tiny):
    """Calibration tree: one (H,)-RMS per quantized matmul, all
    finite/positive; q/k/v share the input_ln stat, gate/up the
    post_ln stat; lm_head gets the final-norm stat."""
    from wedetect_tpu.models.quant_calib import calibrate_decode_acts

    cfg, gh, gw, params, _, _, calib_batches, _, _ = tiny
    calib = calibrate_decode_acts(cfg, params, calib_batches)
    h = cfg.text.hidden
    assert calib["lm_head"].shape == (h,)
    assert np.isfinite(calib["lm_head"]).all()
    for i in range(cfg.text.layers):
        ls = calib["text"][f"layer{i}"]
        for k, dim in (("q_proj", h), ("k_proj", h), ("v_proj", h),
                       ("o_proj", cfg.text.heads * cfg.text.head_dim),
                       ("gate_proj", h), ("up_proj", h),
                       ("down_proj", cfg.text.intermediate)):
            assert ls[k].shape == (dim,), (i, k)
            assert (ls[k] > 0).all() and np.isfinite(ls[k]).all()
        np.testing.assert_array_equal(ls["q_proj"], ls["k_proj"])
        np.testing.assert_array_equal(ls["gate_proj"], ls["up_proj"])


@pytest.mark.slow
def test_collect_act_rms_masked(tiny):
    """Pad slots must not contaminate the statistics: collecting over
    a batch with extra pad columns equals collecting the unpadded
    batch."""
    from wedetect_tpu.models.quant_calib import calibrate_decode_acts

    cfg, gh, gw, params, _, _, calib_batches, _, _ = tiny
    bt = calib_batches[0]
    pad = 5
    b, p = bt["input_ids"].shape
    bt2 = dict(bt)
    bt2["input_ids"] = np.pad(bt["input_ids"], ((0, 0), (0, pad)))
    bt2["attn_mask"] = np.pad(bt["attn_mask"], ((0, 0), (0, pad)))
    bt2["position_ids"] = np.pad(bt["position_ids"],
                                 ((0, 0), (0, 0), (0, pad)))
    c1 = calibrate_decode_acts(cfg, params, [bt])
    c2 = calibrate_decode_acts(cfg, params, [bt2])
    for a, b_ in zip(np.asarray(c1["lm_head"]),
                     np.asarray(c2["lm_head"])):
        np.testing.assert_allclose(a, b_, rtol=1e-5)
    np.testing.assert_allclose(
        c1["text"]["layer0"]["down_proj"],
        c2["text"]["layer0"]["down_proj"], rtol=1e-5)


@pytest.mark.slow
def test_gate_report_int8(tiny):
    """int8 on a tiny model: near-perfect cosine, full greedy
    agreement, tiny REC deltas — the gate must say so."""
    from wedetect_tpu.eval.quant_gate import gate_report
    from wedetect_tpu.models.quant import quantize_decode_params

    cfg, gh, gw, params, gen_batch, rec_batch, _, eos, pad = tiny
    q = quantize_decode_params(params, bits=8)
    rep = gate_report(cfg, gh, gw, params, q, gen_batch, rec_batch,
                      max_new=6, eos_id=eos, pad_id=pad)
    assert rep["logit_cos_min"] > 0.999
    assert rep["greedy_agree_frac_min"] == 1.0
    assert rep["rec"]["max_abs_delta"] < 0.05
    assert rep["rec"]["top1_agree"] == 1.0
    assert rep["n_prompts"] == 4 and rep["quantized_bytes"] > 0


@pytest.mark.slow
def test_gate_report_int4_and_calibrated(tiny):
    """int4 gate runs end to end (plain + calibrated trees) and stays
    inside the documented random-weights envelope; the substituted
    REC forward reflects the dequantized weights (nonzero delta)."""
    from wedetect_tpu.eval.quant_gate import gate_report
    from wedetect_tpu.models.quant import quantize_decode_params
    from wedetect_tpu.models.quant_calib import calibrate_decode_acts

    cfg, gh, gw, params, gen_batch, rec_batch, calib_batches, eos, \
        pad = tiny
    q = quantize_decode_params(params, bits=4)
    rep = gate_report(cfg, gh, gw, params, q, gen_batch, rec_batch,
                      max_new=6, eos_id=eos, pad_id=pad)
    assert rep["logit_cos_min"] > 0.9
    assert 0.0 < rep["greedy_agree_frac_mean"] <= 1.0
    assert rep["rec"]["max_abs_delta"] > 0.0       # weights DID change

    calib = calibrate_decode_acts(cfg, params, calib_batches)
    qc = quantize_decode_params(params, bits=4, calib=calib)
    repc = gate_report(cfg, gh, gw, params, qc, gen_batch, rec_batch,
                       max_new=6, eos_id=eos, pad_id=pad)
    assert repc["logit_cos_min"] > 0.9
    # same byte footprint: calibration changes VALUES, not format
    assert repc["quantized_bytes"] == rep["quantized_bytes"]


@pytest.mark.slow
def test_substitute_text_kernels_roundtrip(tiny):
    """Substituting a tree quantized at infinite precision (int8 of
    pow2-scaled weights would be exact; here: dequantize(quantize)
    twice is idempotent) keeps non-matmul leaves untouched."""
    from wedetect_tpu.eval.quant_gate import substitute_text_kernels
    from wedetect_tpu.models.quant import quantize_decode_params

    cfg, gh, gw, params, *_ = tiny
    q = quantize_decode_params(params, bits=4)
    sub = substitute_text_kernels(params, q)
    l0, s0 = params["text"]["layer0"], sub["text"]["layer0"]
    assert s0["input_ln"] is l0["input_ln"]
    assert sub["embed"] is params["embed"]
    assert not np.array_equal(np.asarray(s0["q_proj"]["kernel"]),
                              np.asarray(l0["q_proj"]["kernel"]))
    deq = dequantize_decode_params(q)
    np.testing.assert_array_equal(
        np.asarray(s0["q_proj"]["kernel"]),
        np.asarray(deq["text"]["layer0"]["q_proj"]["kernel"]))


@pytest.mark.slow
def test_cli_random_mode(tmp_path, capsys):
    """cli/quant_gate --random --calibrate emits one well-formed JSON
    line with plain + calibrated reports."""
    from wedetect_tpu.cli.quant_gate import main

    out = tmp_path / "gate.json"
    rc = main(["--random", "--bits", "4", "--calibrate", "4",
               "--n_prompts", "3", "--max_new", "4",
               "--json_out", str(out)])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(line)
    assert rep["mode"] == "random" and rep["bits"] == 4
    for key in ("plain", "calibrated"):
        r = rep[key]
        assert set(r) >= {"logit_cos_mean", "logit_cos_min",
                          "greedy_agree_frac_mean", "rec",
                          "quantized_bytes"}
        assert -1.0 <= r["logit_cos_min"] <= 1.0
    assert json.loads(out.read_text()) == rep


def test_pack_int4_unpack_stays_pinned():
    """The calibrated path reuses pack_int4 — re-pin the nibble
    round-trip it depends on (guards against format drift)."""
    rng = np.random.default_rng(5)
    q = rng.integers(-7, 8, (16, 10)).astype(np.int8)
    got = np.asarray(unpack_int4(pack_int4(jnp.asarray(q)))
                     .astype(jnp.int8))
    np.testing.assert_array_equal(got, q)
