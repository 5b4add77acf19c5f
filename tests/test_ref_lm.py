"""Stage-1/2 LM-loss SFT tests."""

import numpy as np
import pytest

import jax

from test_ref_api import tiny  # noqa: F401
from wedetect_tpu.train.ref_lm import (IGNORE_INDEX, lm_cross_entropy,
                                       mask_labels, ref_lm_step,
                                       stage_optimizer)
from wedetect_tpu.train.train_step import TrainState


def test_lm_ce():
    import jax.numpy as jnp

    logits = jnp.zeros((1, 4, 10))
    labels = jnp.asarray(np.array([[1, 2, IGNORE_INDEX, 3]]))
    loss = float(lm_cross_entropy(logits, labels))
    assert loss == pytest.approx(np.log(10), rel=1e-5)


def test_mask_labels():
    ids = np.array([[5, 120, 120, 7, 8, 9]])
    labels = mask_labels(ids, 120, [[(3, 5)]])
    np.testing.assert_array_equal(
        labels[0], [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7, 8,
                    IGNORE_INDEX])


def test_ref_lm_step_stage1(tiny):  # noqa: F811
    cfg, params = tiny
    gh = gw = 8
    rng = np.random.default_rng(0)
    n_img, n_obj, l, b = 16, 2, 32, 2
    patches = rng.standard_normal((64, 3 * 2 * 4 * 4)).astype(np.float32)
    ids = rng.integers(1, 100, (b, l)).astype(np.int32)
    ids[:, 2] = cfg.vision_start_token_id
    ids[:, 3:3 + n_img] = cfg.image_token_id
    obj_pos = np.arange(21, 21 + n_obj)
    ids[:, obj_pos] = cfg.object_token_id
    mask = np.ones((b, l), np.int32)
    pos = np.broadcast_to(np.arange(l)[None, None], (3, b, l)).astype(
        np.int32).copy()
    boxes = np.array([[0, 0, 30, 30], [5, 20, 40, 64]], np.float32)
    labels = mask_labels(ids, cfg.image_token_id,
                         [[(20, 30)]] * b)

    tx = stage_optimizer(params, stage=1, base_lr=1e-3)
    state = TrainState.create({"params": params}, tx)
    text_before = jax.tree.leaves(state.params["text"])[0].copy()
    extras_before = np.asarray(
        state.params["extras"]["merge"]["kernel"]).copy()
    losses = []
    for _ in range(3):
        state, m = ref_lm_step(
            cfg, gh, gw, state, patches, ids, mask, pos, 3, boxes,
            np.array([64.0, 64.0], np.float32),
            np.broadcast_to(obj_pos[None], (b, n_obj)).astype(np.int32),
            labels)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    # stage 1: text tower frozen, projectors train
    np.testing.assert_array_equal(
        np.asarray(text_before),
        np.asarray(jax.tree.leaves(state.params["text"])[0]))
    assert not np.array_equal(
        extras_before,
        np.asarray(state.params["extras"]["merge"]["kernel"]))

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
