"""Ref SFT: soft labels + one training step learns."""

import numpy as np
import pytest

import jax

from test_ref_api import tiny  # noqa: F401 (fixture)
from wedetect_tpu.train.ref_sft import (build_soft_labels,
                                        ref_optimizer, ref_sft_step)
from wedetect_tpu.train.train_step import TrainState


def test_soft_labels():
    rng = np.random.default_rng(0)
    gt = np.array([[0, 0, 10, 10], [50, 50, 80, 90]], np.float32)
    props = np.array([[0, 0, 10, 9],      # iou 0.9 with gt0
                      [100, 100, 120, 120]], np.float32)
    out_props, labels = build_soft_labels(gt, props, rng)
    # gt1 unmatched -> appended; 3 proposals total
    assert out_props.shape == (3, 4)
    assert (labels > 0).sum() == 2          # gt0 match + appended gt1
    assert labels.max() == pytest.approx(1.0)  # appended gt has IoU 1
    # the 0.9-iou proposal keeps its soft label
    assert np.isclose(labels, 0.9).any()


def test_soft_labels_no_gt():
    props = np.array([[0, 0, 5, 5]], np.float32)
    p, l = build_soft_labels(np.zeros((0, 4)), props,
                             np.random.default_rng(0))
    assert (l == 0).all() and p.shape == (1, 4)


def test_ref_sft_step_learns(tiny):  # noqa: F811
    cfg, params = tiny
    gh = gw = 8
    rng = np.random.default_rng(0)
    n_img, n_obj, l, b = 16, 3, 40, 2
    patches = rng.standard_normal((64, 3 * 2 * 4 * 4)).astype(np.float32)
    ids = np.zeros((b, l), np.int32)
    ids[:, 2] = cfg.vision_start_token_id
    ids[:, 3:3 + n_img] = cfg.image_token_id
    obj_pos = np.arange(22, 22 + n_obj)
    ids[:, obj_pos] = cfg.object_token_id
    mask = np.ones((b, l), np.int32)
    pos = np.broadcast_to(np.arange(l)[None, None], (3, b, l)).astype(
        np.int32).copy()
    boxes = np.array([[0, 0, 30, 30], [10, 10, 60, 60],
                      [5, 20, 40, 64]], np.float32)
    labels = np.array([[1.0, 0.0, 0.8]] * b, np.float32)

    tx = ref_optimizer(params, base_lr=1e-3, freeze_vision=True)
    state = TrainState.create({"params": params}, tx)
    vision_before = jax.tree.leaves(state.params["vision"])[0].copy()
    losses = []
    for _ in range(4):
        state, m = ref_sft_step(
            cfg, gh, gw, state, patches, ids, mask, pos, 3, boxes,
            np.array([64.0, 64.0], np.float32),
            np.broadcast_to(obj_pos[None], (b, n_obj)).astype(np.int32),
            labels)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    # frozen vision tower unchanged
    vision_after = jax.tree.leaves(state.params["vision"])[0]
    np.testing.assert_array_equal(np.asarray(vision_before),
                                  np.asarray(vision_after))

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
