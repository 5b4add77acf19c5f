"""Core op tests: priors, box coding, IoU family, DFL, letterbox.

Golden values come from independent numpy re-derivations and (where
available) the reference torch implementation loaded read-only.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from wedetect_tpu.ops import (
    grid_priors, flat_priors_and_strides, distance2bbox, bbox2distance,
    bbox_overlaps_aligned, pairwise_iou, dfl_expectation,
)
from wedetect_tpu.ops.letterbox import preprocess_image

from conftest import reference_available, load_reference_standalone


def test_priors_shapes_and_values():
    feat_sizes = [(80, 80), (40, 40), (20, 20)]
    strides = [8, 16, 32]
    levels = grid_priors(feat_sizes, strides)
    assert [l.shape for l in levels] == [(6400, 2), (1600, 2), (400, 2)]
    # first prior of each level at (0.5*stride, 0.5*stride)
    for lvl, s in zip(levels, strides):
        np.testing.assert_allclose(lvl[0], [0.5 * s, 0.5 * s])
    # row-major: second prior moves in x
    np.testing.assert_allclose(levels[0][1], [1.5 * 8, 0.5 * 8])

    flat, stride_vec = flat_priors_and_strides(feat_sizes, strides)
    assert flat.shape == (8400, 2)
    assert stride_vec.shape == (8400,)
    assert (stride_vec[:6400] == 8).all() and (stride_vec[-400:] == 32).all()


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_priors_match_reference():
    import torch
    ref = load_reference_standalone()
    gen = ref.MlvlPointGenerator(strides=[8, 16, 32], offset=0.5)
    feat_sizes = [(80, 80), (40, 40), (20, 20)]
    ref_priors = gen.grid_priors(feat_sizes, dtype=torch.float32,
                                 device="cpu")
    ours = grid_priors(feat_sizes, [8, 16, 32])
    for r, o in zip(ref_priors, ours):
        np.testing.assert_allclose(r.numpy(), o, rtol=0, atol=0)


def test_distance2bbox_roundtrip(rng):
    points = jnp.asarray(rng.uniform(0, 640, (100, 2)).astype(np.float32))
    dist = jnp.asarray(rng.uniform(0.1, 10, (100, 4)).astype(np.float32))
    boxes = distance2bbox(points, dist)
    back = bbox2distance(points, boxes, max_dis=None)
    # f32 cancellation against coordinates up to 640 -> ~1e-4 abs error
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist),
                               rtol=1e-4, atol=1e-3)
    # clamp semantics
    clamped = bbox2distance(points, boxes, max_dis=4.0, eps=0.01)
    assert float(jnp.max(clamped)) <= 4.0 - 0.01 + 1e-6


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_distance2bbox_match_reference(rng):
    import torch
    ref = load_reference_standalone()
    points = rng.uniform(0, 640, (1, 50, 2)).astype(np.float32)
    dist = rng.uniform(0, 30, (1, 50, 4)).astype(np.float32)
    r = ref.distance2bbox(torch.from_numpy(points), torch.from_numpy(dist))
    o = distance2bbox(jnp.asarray(points), jnp.asarray(dist))
    np.testing.assert_allclose(r.numpy(), np.asarray(o), rtol=1e-6, atol=1e-6)


def _random_boxes(rng, n):
    xy = rng.uniform(0, 600, (n, 2))
    wh = rng.uniform(1, 80, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_pairwise_iou_basic(rng):
    b1 = _random_boxes(rng, 8)
    iou = np.asarray(pairwise_iou(jnp.asarray(b1), jnp.asarray(b1)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
    assert (iou >= 0).all() and (iou <= 1 + 1e-6).all()
    # disjoint boxes
    a = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    b = jnp.asarray(np.array([[20, 20, 30, 30]], np.float32))
    assert float(pairwise_iou(a, b)[0, 0]) == 0.0


@pytest.mark.parametrize("mode", ["iou", "ciou", "giou", "siou"])
def test_bbox_overlaps_against_torch_reference(rng, mode):
    """Compare against the reference iou_loss.bbox_overlaps formulas,
    re-derived in torch below (reference:
    wedetect/models/losses/iou_loss.py:13-180)."""
    import torch
    import math

    p = _random_boxes(rng, 64)
    t = _random_boxes(rng, 64)
    ours = np.asarray(bbox_overlaps_aligned(jnp.asarray(p), jnp.asarray(t),
                                            iou_mode=mode))

    pred, target = torch.from_numpy(p), torch.from_numpy(t)
    eps = 1e-7
    b1x1, b1y1, b1x2, b1y2 = pred.unbind(-1)
    b2x1, b2y1, b2x2, b2y2 = target.unbind(-1)
    overlap = ((torch.min(b1x2, b2x2) - torch.max(b1x1, b2x1)).clamp(0)
               * (torch.min(b1y2, b2y2) - torch.max(b1y1, b2y1)).clamp(0))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + w2 * h2 - overlap + eps
    h1e, h2e = h1 + eps, h2 + eps
    ious = overlap / union
    ex1, ey1 = torch.min(b1x1, b2x1), torch.min(b1y1, b2y1)
    ex2, ey2 = torch.max(b1x2, b2x2), torch.max(b1y2, b2y2)
    ew, eh = (ex2 - ex1).clamp(0), (ey2 - ey1).clamp(0)
    if mode == "iou":
        ref = ious
    elif mode == "ciou":
        enclose_area = ew**2 + eh**2 + eps
        rho2 = (((b2x1 + b2x2) - (b1x1 + b1x2))**2 / 4
                + ((b2y1 + b2y2) - (b1y1 + b1y2))**2 / 4)
        wh_ratio = (4 / math.pi**2) * (torch.atan(w2 / h2e)
                                       - torch.atan(w1 / h1e))**2
        alpha = wh_ratio / (wh_ratio - ious + (1 + eps))
        ref = ious - (rho2 / enclose_area + alpha * wh_ratio)
    elif mode == "giou":
        convex = ew * eh + eps
        ref = ious - (convex - union) / convex
    else:  # siou
        sigma_cw = (b2x1 + b2x2) / 2 - (b1x1 + b1x2) / 2 + eps
        sigma_ch = (b2y1 + b2y2) / 2 - (b1y1 + b1y2) / 2 + eps
        sigma = (sigma_cw**2 + sigma_ch**2).pow(0.5)
        sin_alpha = sigma_ch.abs() / sigma
        sin_beta = sigma_cw.abs() / sigma
        sin_alpha = torch.where(sin_alpha <= math.sin(math.pi / 4),
                                sin_alpha, sin_beta)
        angle_cost = torch.cos(torch.arcsin(sin_alpha) * 2 - math.pi / 2)
        rho_x = (sigma_cw / ew)**2
        rho_y = (sigma_ch / eh)**2
        gamma = 2 - angle_cost
        distance_cost = ((1 - torch.exp(-gamma * rho_x))
                         + (1 - torch.exp(-gamma * rho_y)))
        omiga_w = (w1 - w2).abs() / torch.max(w1, w2)
        omiga_h = (h1 - h2).abs() / torch.max(h1, h2)
        shape_cost = ((1 - torch.exp(-omiga_w))**4
                      + (1 - torch.exp(-omiga_h))**4)
        ref = ious - (distance_cost + shape_cost) * 0.5
    ref = ref.clamp(-1, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_dfl_expectation(rng):
    reg_max = 16
    logits = rng.normal(size=(3, 7, 4 * reg_max)).astype(np.float32)
    out = np.asarray(dfl_expectation(jnp.asarray(logits), reg_max))
    assert out.shape == (3, 7, 4)
    # reference semantics: softmax over bins, expectation against arange
    probs = np.exp(logits.reshape(3, 7, 4, reg_max))
    probs /= probs.sum(-1, keepdims=True)
    ref = (probs * np.arange(reg_max)).sum(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert (out >= 0).all() and (out <= reg_max - 1).all()


def test_letterbox_geometry():
    img = np.full((480, 640, 3), 200, np.uint8)
    out, sf, pad, ori = preprocess_image(img, (640, 640))
    assert out.shape == (640, 640, 3)
    assert ori == (480, 640)
    np.testing.assert_allclose(sf, [1.0, 1.0])
    # 480 -> 480 tall, pad 160 split 80/80
    np.testing.assert_allclose(pad, [80, 80, 0, 0])
    assert (out[0] == 114).all() and (out[-1] == 114).all()
    assert (out[80] == 200).all()

    # downscale case: 1280x960 -> ratio 0.5
    img2 = np.full((960, 1280, 3), 50, np.uint8)
    out2, sf2, pad2, _ = preprocess_image(img2, (640, 640))
    np.testing.assert_allclose(sf2, [0.5, 0.5])
    np.testing.assert_allclose(pad2, [80, 80, 0, 0])


def test_letterbox_odd_padding():
    # odd padding splits floor/ceil like the reference round(p//2 - 0.1)
    img = np.zeros((100, 640, 3), np.uint8)
    out, sf, pad, _ = preprocess_image(img, (640, 640))
    assert pad[0] + pad[1] == 640 - 100
    assert pad[0] == (640 - 100) // 2
