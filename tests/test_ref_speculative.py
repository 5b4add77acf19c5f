"""Prompt-lookup speculative decoding (models/ref_speculative).

The contract is EXACT greedy equivalence with models/ref_generate —
speculation may only change how many verify forwards run, never the
emitted tokens. No reference counterpart (the reference inherits HF
.generate with no assisted decoding)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from test_ref_generate import build_prompt, tiny_cfg
from wedetect_tpu.models.ref import RefModules
from wedetect_tpu.models.ref_generate import ref_generate
from wedetect_tpu.models.ref_speculative import (draft_lookup,
                                                 ref_generate_spec)


def test_draft_lookup():
    """The drafting primitive: most-recent n-gram match, continuation
    tokens, found flag, validity masking."""
    hist = jnp.asarray(np.array([
        [5, 6, 7, 8, 5, 6, 9, 3, 0, 0],     # two matches of (5,6)
        [1, 2, 3, 4, 1, 9, 8, 7, 0, 0],     # no match of (9, 9)
    ], np.int32))
    valid = jnp.asarray(np.array([
        [1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
        [1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
    ], np.int32))
    gram = jnp.asarray(np.array([[5, 6], [9, 9]], np.int32))
    draft, found = draft_lookup(hist, gram, valid, spec_k=4)
    assert bool(found[0]) and not bool(found[1])
    # most RECENT match is at 4 -> continuation hist[6:9] = 9, 3, 0
    np.testing.assert_array_equal(np.asarray(draft[0]), [9, 3, 0])

    # a match whose n-gram straddles the invalid region is rejected
    valid2 = valid.at[0, 5].set(0)
    _, found2 = draft_lookup(hist, gram, valid2, spec_k=4)
    assert bool(found2[0])          # the position-0 match remains
    valid3 = valid2.at[0, 1].set(0)
    _, found3 = draft_lookup(hist, gram, valid3, spec_k=4)
    assert not bool(found3[0])

    # a match whose CONTINUATION START is invalid is rejected (else
    # the frontier match would always draft unwritten pad slots):
    # match at 4 loses its continuation (slot 6) -> fall back to the
    # match at 0, whose continuation is hist[2:5]
    valid4 = valid.at[0, 6].set(0)
    draft4, found4 = draft_lookup(hist, gram, valid4, spec_k=4)
    assert bool(found4[0])
    np.testing.assert_array_equal(np.asarray(draft4[0]), [7, 8, 5])


def _setup(seed, tails=(5, 3), max_new=16):
    cfg = tiny_cfg()
    gh = gw = 8
    rng = np.random.default_rng(seed)
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    prompts = [build_prompt(cfg, gh, gw, t, rng) for t in tails]
    p = max(len(i) for i, _ in prompts)
    bsz = len(prompts)
    ids = np.zeros((bsz, p), np.int32)
    mask = np.zeros((bsz, p), np.int32)
    pos = np.zeros((3, bsz, p), np.int32)
    next_pos = np.zeros(bsz, np.int32)
    for r, (i_r, p_r) in enumerate(prompts):
        ids[r, :len(i_r)] = i_r
        mask[r, :len(i_r)] = 1
        pos[:, r, :len(i_r)] = p_r
        next_pos[r] = p_r.max() + 1
    boxes = np.array([[0, 0, 64, 64]], np.float32)
    ori = np.array([64.0, 64.0], np.float32)
    mod = RefModules(cfg, gh, gw)
    variables = mod.init(
        jax.random.PRNGKey(seed), jnp.asarray(patches),
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pos),
        jnp.asarray(boxes), jnp.asarray(ori), 2,
        jnp.zeros((bsz, 1), jnp.int32))
    args = (cfg, gh, gw, variables["params"], jnp.asarray(patches),
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pos), 2,
            jnp.asarray(next_pos), jnp.asarray(boxes),
            jnp.asarray(ori), max_new)
    return args


def test_spec_matches_plain_greedy():
    """Token-for-token equality with ref_generate across seeds and
    ragged batches; tiny random decoders greedily fall into repeating
    cycles, so at least one seed must also demonstrate actual draft
    acceptance (steps < max_new)."""
    accepted_somewhere = False
    for seed in (0, 1, 2, 3):
        args = _setup(seed)
        plain = np.asarray(ref_generate(*args, eos_id=95, pad_id=0))
        toks, steps = ref_generate_spec(*args, eos_id=95, pad_id=0)
        np.testing.assert_array_equal(np.asarray(toks), plain,
                                      err_msg=f"seed {seed}")
        assert int(steps) <= args[-1]
        if int(steps) < args[-1]:
            accepted_somewhere = True
    assert accepted_somewhere, \
        "no seed produced an accepted draft (cycling output expected)"


def test_spec_eos_and_padding():
    """Rows that hit eos freeze (pad after eos) exactly like the plain
    decoder, including when eos arrives inside an accepted block."""
    args = _setup(7, tails=(4,), max_new=12)
    # make eos reachable: pick the most frequent greedy token as eos
    plain0 = np.asarray(ref_generate(*args, eos_id=95, pad_id=0))
    vals, counts = np.unique(plain0[plain0 > 0], return_counts=True)
    eos = int(vals[np.argmax(counts)]) if len(vals) else 95
    plain = np.asarray(ref_generate(*args, eos_id=eos, pad_id=0))
    toks, _ = ref_generate_spec(*args, eos_id=eos, pad_id=0)
    np.testing.assert_array_equal(np.asarray(toks), plain)


@pytest.mark.parametrize("bits", [8, 4])
def test_spec_composes_with_quantized_decode(bits):
    """speculation x int8/int4: decode_params threads through the
    verify block (matmul_any / prepare_decode_params) and tokens
    equal the quantized plain decode."""
    from wedetect_tpu.models.quant import quantize_decode_params

    args = _setup(5, tails=(4, 6), max_new=10)
    q = quantize_decode_params(args[3], bits=bits)
    plain = np.asarray(ref_generate(*args, eos_id=95, pad_id=0,
                                    decode_params=q))
    toks, _ = ref_generate_spec(*args, eos_id=95, pad_id=0,
                                decode_params=q)
    np.testing.assert_array_equal(np.asarray(toks), plain)


def test_spec_k_and_ngram_variants():
    """Output is invariant to spec_k / ngram (they change only the
    draft schedule)."""
    args = _setup(3, tails=(5,), max_new=12)
    base, _ = ref_generate_spec(*args, eos_id=95, pad_id=0)
    for spec_k, ngram in ((4, 2), (6, 3), (2, 1)):
        toks, _ = ref_generate_spec(*args, eos_id=95, pad_id=0,
                                    spec_k=spec_k, ngram=ngram)
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.asarray(base),
                                      err_msg=f"K={spec_k} n={ngram}")


def test_spec_force_reject_exact_and_one_per_step():
    """force_reject=True (the acceptance-collapse bound bench_spec
    measures) must still emit the exact greedy tokens, taking exactly
    one verify step per emitted token."""
    args = _setup(2, tails=(5, 7), max_new=10)
    plain = np.asarray(ref_generate(*args, eos_id=95, pad_id=0))
    toks, steps = ref_generate_spec(*args, eos_id=95, pad_id=0,
                                    force_reject=True)
    np.testing.assert_array_equal(np.asarray(toks), plain)
    # steps = longest row's emitted count (rows pad after eos)
    longest = max(int((row != 0).sum()) for row in plain)
    assert int(steps) == max(longest, 1)


# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
