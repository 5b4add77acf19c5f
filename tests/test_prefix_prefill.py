"""Prefix-sharing prefill: split path must equal the joint prefill.

The REC scorer's sequences share everything up to the end of the
vision span; prefill_split runs that prefix through the decoder once
and lets the per-query suffixes attend to its KV (end-aligned
rectangular causal). These tests pin (a) the rectangular-causal
attention semantics and (b) bit-level agreement of the split scoring
path with the joint ref_score_step on a tiny config.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wedetect_tpu.models.ref import (RefModules, ref_score_step,
                                     ref_score_step_split)
from wedetect_tpu.nn.qwen3vl import (RefCfg, RefTextCfg, RefVisionCfg,
                                     get_rope_index_single_image)
from wedetect_tpu.ops.attention import dot_product_attention


def test_rectangular_causal_matches_joint_suffix():
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 8
    p, s = 7, 5          # prefix len, suffix len
    q_full = rng.standard_normal((b, p + s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, p + s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, p + s, h, d)).astype(np.float32)
    valid = np.ones((b, p + s), np.int32)
    valid[1, -2:] = 0    # padded tail keys

    full = dot_product_attention(jnp.asarray(q_full), jnp.asarray(k),
                                 jnp.asarray(v), causal=True,
                                 kv_valid=jnp.asarray(valid),
                                 impl="einsum")
    rect = dot_product_attention(jnp.asarray(q_full[:, p:]),
                                 jnp.asarray(k), jnp.asarray(v),
                                 causal=True,
                                 kv_valid=jnp.asarray(valid),
                                 impl="einsum")
    np.testing.assert_allclose(np.asarray(rect),
                               np.asarray(full)[:, p:], rtol=1e-6,
                               atol=1e-6)


@pytest.fixture(scope="module")
def tiny_cfg():
    return RefCfg(
        vision=RefVisionCfg(depth=4, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(1, 2)),
        text=RefTextCfg(vocab_size=128, hidden=48, layers=2, heads=4,
                        kv_heads=2, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=120, vision_start_token_id=122,
        object_token_id=123)


def test_split_prefill_matches_joint(tiny_cfg):
    c = tiny_cfg
    rng = np.random.default_rng(1)
    gh = gw = 8
    n_img = (gh // 2) * (gw // 2)        # 16
    n_obj = 2
    ow, oh = 96.0, 64.0

    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    boxes = np.array([[4, 4, 60, 40], [10, 8, 90, 60]], np.float32)

    prefix_real = np.concatenate([
        np.array([1, 2, 122]), np.full(n_img, 120), np.array([7])])
    p_real = len(prefix_real)            # 20
    visual_start = 3

    # three queries with different lengths
    suffix_rows = [
        np.concatenate([np.array([9, 8, 5]), np.full(n_obj, 123),
                        np.array([2])]),
        np.concatenate([np.array([11]), np.full(n_obj, 123),
                        np.array([2])]),
        np.concatenate([np.array([4, 6, 10, 3]), np.full(n_obj, 123),
                        np.array([2])]),
    ]
    b = len(suffix_rows)
    s_pad = 8
    p_pad = 24                           # exercise prefix padding too

    # ---- joint layout (per-row prefix+suffix, end-padded) ----
    l = p_real + s_pad
    ids_joint = np.zeros((b, l), np.int32)
    mask_joint = np.zeros((b, l), np.int32)
    pos_joint = np.zeros((3, b, l), np.int64)
    obj_joint = np.zeros((b, n_obj), np.int32)
    suffix_ids = np.zeros((b, s_pad), np.int32)
    suffix_mask = np.zeros((b, s_pad), np.int32)
    pos_suffix = np.zeros((3, b, s_pad), np.int64)
    obj_suffix = np.zeros((b, n_obj), np.int32)
    for i, suf in enumerate(suffix_rows):
        seq = np.concatenate([prefix_real, suf])
        ids_joint[i, :len(seq)] = seq
        mask_joint[i, :len(seq)] = 1
        pos = get_rope_index_single_image(
            np.pad(seq, (0, l - len(seq))), 120, gh, gw, 2)
        pos_joint[:, i] = pos
        op = np.nonzero(seq == 123)[0]
        obj_joint[i] = op
        suffix_ids[i, :len(suf)] = suf
        suffix_mask[i, :len(suf)] = 1
        pos_suffix[:, i] = pos[:, p_real:]
        obj_suffix[i] = op - p_real

    prefix_ids = np.zeros((1, p_pad), np.int32)
    prefix_ids[0, :p_real] = prefix_real
    prefix_mask = np.zeros((1, p_pad), np.int32)
    prefix_mask[0, :p_real] = 1
    pos_prefix = np.zeros((3, 1, p_pad), np.int64)
    pos_prefix[:, 0, :p_real] = pos_joint[:, 0, :p_real]

    variables = RefModules(c, gh, gw).init(
        jax.random.PRNGKey(0), patches, ids_joint, mask_joint,
        pos_joint.astype(np.int32), boxes,
        np.array([ow, oh], np.float32), visual_start, obj_joint)
    params = variables["params"]

    want = ref_score_step(
        c, gh, gw, params, jnp.asarray(patches),
        jnp.asarray(ids_joint), jnp.asarray(mask_joint),
        jnp.asarray(pos_joint.astype(np.int32)), visual_start,
        jnp.asarray(boxes), jnp.asarray(np.array([ow, oh], np.float32)),
        jnp.asarray(obj_joint))
    got = ref_score_step_split(
        c, gh, gw, params, jnp.asarray(patches),
        jnp.asarray(prefix_ids), jnp.asarray(suffix_ids),
        jnp.asarray(prefix_mask), jnp.asarray(suffix_mask),
        jnp.asarray(pos_prefix.astype(np.int32)),
        jnp.asarray(pos_suffix.astype(np.int32)), jnp.asarray(boxes),
        visual_start, jnp.asarray(np.array([ow, oh], np.float32)),
        jnp.asarray(obj_suffix))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_two_stage_matches_one_shot(tiny_cfg):
    """ref_prefix_step + ref_suffix_step (image-level caching) equals
    the one-shot ref_score_step_split."""
    from wedetect_tpu.models.ref import ref_prefix_step, ref_suffix_step

    c = tiny_cfg
    rng = np.random.default_rng(2)
    gh = gw = 8
    n_img = (gh // 2) * (gw // 2)
    n_obj = 2
    ow, oh = 96.0, 64.0
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    boxes = np.array([[4, 4, 60, 40], [10, 8, 90, 60]], np.float32)
    prefix_real = np.concatenate([
        np.array([1, 2, 122]), np.full(n_img, 120), np.array([7])])
    p_real = len(prefix_real)
    p_pad = 24
    prefix_ids = np.zeros((1, p_pad), np.int32)
    prefix_ids[0, :p_real] = prefix_real
    prefix_mask = np.zeros((1, p_pad), np.int32)
    prefix_mask[0, :p_real] = 1
    pos_prefix = np.zeros((3, 1, p_pad), np.int32)
    pos_prefix[:, 0, :p_real] = get_rope_index_single_image(
        prefix_real, 120, gh, gw, 2)

    b, s_pad = 3, 8
    sufs = [np.concatenate([np.array([9, 8]), np.full(n_obj, 123),
                            np.array([2])]),
            np.concatenate([np.array([11, 4, 6]), np.full(n_obj, 123),
                            np.array([2])]),
            np.concatenate([np.full(n_obj, 123), np.array([2])])]
    suffix_ids = np.zeros((b, s_pad), np.int32)
    suffix_mask = np.zeros((b, s_pad), np.int32)
    obj_suffix = np.zeros((b, n_obj), np.int32)
    for i, suf in enumerate(sufs):
        suffix_ids[i, :len(suf)] = suf
        suffix_mask[i, :len(suf)] = 1
        obj_suffix[i] = np.nonzero(suf == 123)[0]
    next_pos = int(pos_prefix[0, 0, p_real - 1]) + 1
    pos_suffix = np.broadcast_to(
        (next_pos + np.arange(s_pad, dtype=np.int32))[None, None],
        (3, b, s_pad)).copy()

    variables = RefModules(tiny_cfg, gh, gw).init(
        jax.random.PRNGKey(3), patches,
        np.zeros((1, 32), np.int32), np.ones((1, 32), np.int32),
        np.zeros((3, 1, 32), np.int32), boxes,
        np.array([ow, oh], np.float32), 3, np.zeros((1, 2), np.int32))
    params = variables["params"]
    args = (jnp.asarray(patches), jnp.asarray(prefix_ids),
            jnp.asarray(suffix_ids), jnp.asarray(prefix_mask),
            jnp.asarray(suffix_mask), jnp.asarray(pos_prefix),
            jnp.asarray(pos_suffix), jnp.asarray(boxes), 3,
            jnp.asarray(np.array([ow, oh], np.float32)),
            jnp.asarray(obj_suffix))
    want = ref_score_step_split(c, gh, gw, params, *args)
    obj, kvs = ref_prefix_step(c, gh, gw, params, args[0], args[1],
                               args[3], args[5], args[7], args[9],
                               args[8])
    got = ref_suffix_step(c, gh, gw, params, obj, kvs, args[2],
                          args[4], args[6], args[3], args[10])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
