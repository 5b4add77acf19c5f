"""End-to-end detector graph tests on a miniature config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wedetect_tpu.configs import ModelCfg, TestCfg
from wedetect_tpu.models.wedetect import (
    Detections, detect_step, forward_raw, init_variables)


def mini_cfg(num_prompts=0, num_classes=4):
    return ModelCfg(
        name="mini",
        depths=(1, 1, 2, 1), dims=(32, 64, 128, 256),
        neck_scale=0.25, neck_repeats=2,
        head_in_channels=(32, 64, 128),
        embed_dims=32, img_size=(64, 64),
        text=None, num_prompts=num_prompts, num_classes=num_classes,
        test=TestCfg(nms_pre=256, max_per_img=16),
    )


@pytest.fixture(scope="module")
def cfg():
    return mini_cfg()


@pytest.fixture(scope="module")
def variables(cfg):
    return init_variables(cfg, seed=0)


def test_detect_step_shapes(cfg, variables):
    b, k = 2, cfg.num_classes
    imgs = np.random.default_rng(0).integers(
        0, 255, (b, 64, 64, 3), dtype=np.uint8)
    w = np.random.default_rng(1).standard_normal(
        (k, cfg.embed_dims)).astype(np.float32)
    sf = np.ones((b, 2), np.float32)
    pad = np.zeros((b, 4), np.float32)
    ori = np.full((b, 2), 64, np.float32)
    det = detect_step(cfg, variables, jnp.asarray(imgs), jnp.asarray(w),
                      jnp.asarray(sf), jnp.asarray(pad), jnp.asarray(ori))
    assert isinstance(det, Detections)
    m = cfg.test.max_per_img
    assert det.boxes.shape == (b, m, 4)
    assert det.scores.shape == (b, m)
    assert det.labels.shape == (b, m)
    assert det.embeds.shape == (b, m, cfg.embed_dims)
    assert det.valid.shape == (b, m)
    boxes = np.asarray(det.boxes)
    assert (boxes >= 0).all() and (boxes <= 64).all()
    labels = np.asarray(det.labels)
    valid = np.asarray(det.valid)
    assert ((labels[valid] >= 0) & (labels[valid] < k)).all()


def test_forward_raw_shapes(cfg, variables):
    imgs = np.zeros((1, 64, 64, 3), np.uint8)
    w = np.zeros((4, cfg.embed_dims), np.float32)
    out = forward_raw(cfg, variables, jnp.asarray(imgs), jnp.asarray(w))
    a = cfg.num_anchors
    assert a == 8 * 8 + 4 * 4 + 2 * 2
    assert out.scores.shape == (1, a, 4)
    assert out.boxes.shape == (1, a, 4)
    assert out.embeds.shape == (1, a, cfg.embed_dims)


def test_uni_prompts():
    cfg = mini_cfg(num_prompts=8, num_classes=8)
    variables = init_variables(cfg, seed=0)
    assert variables["params"]["embeddings"].shape == (8, cfg.embed_dims)
    imgs = np.zeros((1, 64, 64, 3), np.uint8)
    out = forward_raw(cfg, variables, jnp.asarray(imgs), None)
    assert out.scores.shape == (1, cfg.num_anchors, 8)


def test_unletterbox_rescale(cfg, variables):
    """pad/scale inversion maps letterboxed coords back to original."""
    imgs = np.random.default_rng(0).integers(
        0, 255, (1, 64, 64, 3), dtype=np.uint8)
    w = np.random.default_rng(1).standard_normal(
        (4, cfg.embed_dims)).astype(np.float32)
    # pretend original image was 100x50 resized by 0.5 with pad t=7 l=3
    sf = np.array([[0.5, 0.5]], np.float32)
    pad = np.array([[7, 0, 3, 0]], np.float32)
    ori = np.array([[100, 50]], np.float32)  # (h, w)
    det = detect_step(cfg, variables, jnp.asarray(imgs), jnp.asarray(w),
                      jnp.asarray(sf), jnp.asarray(pad), jnp.asarray(ori))
    det0 = detect_step(cfg, variables, jnp.asarray(imgs), jnp.asarray(w),
                       jnp.asarray(np.ones((1, 2), np.float32)),
                       jnp.asarray(np.zeros((1, 4), np.float32)),
                       jnp.asarray(np.full((1, 2), 1e4, np.float32)))
    b1 = np.asarray(det.boxes)[0]
    b0 = np.asarray(det0.boxes)[0]
    valid = np.asarray(det.valid)[0] & np.asarray(det0.valid)[0]
    expect = (b0 - np.array([3, 7, 3, 7])) / 0.5
    expect = np.clip(expect, 0, [50, 100, 50, 100])
    np.testing.assert_allclose(b1[valid], expect[valid], atol=1e-3)


def test_uni_mlp_adapter():
    import dataclasses

    cfg = dataclasses.replace(mini_cfg(num_prompts=8, num_classes=8),
                              use_mlp_adapter=True)
    variables = init_variables(cfg, seed=0)
    assert "adapter_fc1" in variables["params"]
    imgs = np.zeros((1, 64, 64, 3), np.uint8)
    out = forward_raw(cfg, variables, jnp.asarray(imgs), None)
    assert np.isfinite(np.asarray(out.scores)).all()


def test_xlarge_down_proj():
    import dataclasses

    cfg = dataclasses.replace(
        mini_cfg(), dims=(32, 64, 128, 512), backbone_down_proj=256)
    variables = init_variables(cfg, seed=0)
    assert "down_mlp" in variables["params"]
    out = forward_raw(cfg, variables, jnp.asarray(
        np.zeros((1, 64, 64, 3), np.uint8)),
        jnp.asarray(np.zeros((4, cfg.embed_dims), np.float32)))
    assert np.isfinite(np.asarray(out.logits)).all()


def test_class_mask_bucketing(cfg, variables):
    """padded class lanes (class_mask False) never produce detections."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    w = rng.standard_normal((4, cfg.embed_dims)).astype(np.float32)
    mask = np.array([True, True, False, False])
    det = detect_step(cfg, variables, jnp.asarray(imgs), jnp.asarray(w),
                      jnp.asarray(np.ones((1, 2), np.float32)),
                      jnp.asarray(np.zeros((1, 4), np.float32)),
                      jnp.asarray(np.full((1, 2), 64.0, np.float32)),
                      jnp.asarray(mask))
    labels = np.asarray(det.labels[0])[np.asarray(det.valid[0])]
    assert (labels < 2).all()

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
