"""Flip TTA: merge semantics and mirror consistency.

Reference behavior: test.py:95-128 --tta with the default DetTTAModel
(horizontal flip view, class-aware NMS merge at iou 0.5, top 100).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wedetect_tpu.configs import get_config
from wedetect_tpu.models.wedetect import (detect_step, detect_step_tta,
                                          init_variables)
from wedetect_tpu.ops.nms import nms_labeled


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_config("tiny", num_classes=4, img_size=(128, 128))
    variables = init_variables(cfg, seed=0)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, cfg.embed_dims))
                    .astype(np.float32))
    return cfg, variables, w


def _metas(b, hw):
    sf = jnp.ones((b, 2), jnp.float32)
    pad = jnp.zeros((b, 4), jnp.float32)
    ori = jnp.full((b, 2), float(hw), jnp.float32)
    return sf, pad, ori


def test_nms_labeled_oracle():
    """Greedy labeled NMS against a numpy oracle."""
    rng = np.random.default_rng(1)
    n = 40
    boxes = rng.uniform(0, 80, (1, n, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, 40, (1, n, 2))
    scores = rng.uniform(0.01, 1.0, (1, n)).astype(np.float32)
    labels = rng.integers(0, 3, (1, n)).astype(np.int32)
    valid = np.ones((1, n), bool)
    valid[0, -5:] = False

    res = nms_labeled(jnp.asarray(boxes), jnp.asarray(scores),
                      jnp.asarray(labels), jnp.asarray(valid),
                      iou_thr=0.5, max_out=10)

    # numpy greedy oracle
    def iou(a, b):
        x1 = np.maximum(a[0], b[:, 0]); y1 = np.maximum(a[1], b[:, 1])
        x2 = np.minimum(a[2], b[:, 2]); y2 = np.minimum(a[3], b[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) - inter)
        return inter / np.maximum(ua, 1e-9)

    order = np.argsort(-np.where(valid[0], scores[0], -np.inf))
    kept = []
    for i in order:
        if not valid[0, i]:
            continue
        if all(labels[0, i] != labels[0, j]
               or iou(boxes[0, i], boxes[0, j:j + 1])[0] <= 0.5
               for j in kept):
            kept.append(i)
        if len(kept) == 10:
            break
    nk = int(np.asarray(res.valid[0]).sum())
    assert nk == len(kept)
    np.testing.assert_allclose(np.asarray(res.boxes[0][:nk]),
                               boxes[0][kept], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(res.labels[0][:nk]),
                                  labels[0][kept])


def test_tta_output_is_subset_of_two_view_union(tiny_setup):
    """Every TTA detection must come from the union of the two views'
    detections (original + unflipped flip view), with its score."""
    cfg, variables, w = tiny_setup
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (1, 128, 128, 3)).astype(np.uint8)
    sf, pad, ori = _metas(1, 128)

    d_o = detect_step(cfg, variables, jnp.asarray(img), w, sf, pad,
                      ori)
    d_f = detect_step(cfg, variables, jnp.asarray(img[:, :, ::-1]),
                      w, sf, pad, ori)
    fb = np.asarray(d_f.boxes[0])[np.asarray(d_f.valid[0])]
    fb = np.stack([128 - fb[:, 2], fb[:, 1],
                   128 - fb[:, 0], fb[:, 3]], -1)
    union_b = np.concatenate(
        [np.asarray(d_o.boxes[0])[np.asarray(d_o.valid[0])], fb])
    union_s = np.concatenate(
        [np.asarray(d_o.scores[0])[np.asarray(d_o.valid[0])],
         np.asarray(d_f.scores[0])[np.asarray(d_f.valid[0])]])

    tta = detect_step_tta(cfg, variables, jnp.asarray(img), w, sf,
                          pad, ori)
    tb = np.asarray(tta.boxes[0])[np.asarray(tta.valid[0])]
    ts = np.asarray(tta.scores[0])[np.asarray(tta.valid[0])]
    assert len(tb) > 0
    for bx, sc in zip(tb, ts):
        d = np.abs(union_b - bx).max(-1) + 1e3 * np.abs(union_s - sc)
        j = int(d.argmin())
        assert np.abs(union_b[j] - bx).max() < 1e-3
        assert abs(union_s[j] - sc) < 1e-5
    # and the TTA kept set respects its own NMS threshold per class
    tl = np.asarray(tta.labels[0])[np.asarray(tta.valid[0])]
    for i in range(len(tb)):
        for j in range(i + 1, len(tb)):
            if tl[i] != tl[j]:
                continue
            x1 = max(tb[i, 0], tb[j, 0]); y1 = max(tb[i, 1], tb[j, 1])
            x2 = min(tb[i, 2], tb[j, 2]); y2 = min(tb[i, 3], tb[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            ua = ((tb[i, 2] - tb[i, 0]) * (tb[i, 3] - tb[i, 1])
                  + (tb[j, 2] - tb[j, 0]) * (tb[j, 3] - tb[j, 1])
                  - inter)
            assert inter / max(ua, 1e-9) <= cfg.test.tta_nms_iou_thr + 1e-5


def test_tta_mirror_consistency(tiny_setup):
    """TTA(mirror(I)) == mirror(TTA(I)): same scores, mirrored boxes."""
    cfg, variables, w = tiny_setup
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (1, 128, 128, 3)).astype(np.uint8)
    sf, pad, ori = _metas(1, 128)

    r1 = detect_step_tta(cfg, variables, jnp.asarray(img), w, sf, pad,
                         ori)
    r2 = detect_step_tta(cfg, variables, jnp.asarray(img[:, :, ::-1]),
                         w, sf, pad, ori)

    v1, v2 = np.asarray(r1.valid[0]), np.asarray(r2.valid[0])
    assert v1.sum() == v2.sum() > 0
    b1 = np.asarray(r1.boxes[0])[v1]
    b2 = np.asarray(r2.boxes[0])[v2]
    s1 = np.asarray(r1.scores[0])[v1]
    s2 = np.asarray(r2.scores[0])[v2]
    m2 = np.stack([128 - b2[:, 2], b2[:, 1],
                   128 - b2[:, 0], b2[:, 3]], -1)
    # the TTA candidate union is mirror-symmetric, so kept sets match
    # up to ordering; match each b1 row to its mirrored counterpart
    used = set()
    for bx, sc in zip(b1, s1):
        d = np.abs(m2 - bx).max(-1) + 1e3 * np.abs(s2 - sc)
        j = int(d.argmin())
        assert np.abs(m2[j] - bx).max() < 0.1
        assert abs(s2[j] - sc) < 1e-4
        used.add(j)
    assert len(used) == len(b1)


def test_tta_batched_shapes(tiny_setup):
    cfg, variables, w = tiny_setup
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    sf, pad, ori = _metas(2, 128)
    r = detect_step_tta(cfg, variables, jnp.asarray(imgs), w, sf, pad,
                        ori)
    m = cfg.test.tta_max_per_img
    assert r.boxes.shape == (2, m, 4)
    assert r.embeds.shape[:2] == (2, m)
    b = np.asarray(r.boxes)
    assert (b >= 0).all() and (b <= 128).all()

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
