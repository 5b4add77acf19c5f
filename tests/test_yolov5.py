"""YOLOv5 legacy decode tests (hand-computed)."""

import numpy as np
import pytest

import jax.numpy as jnp

from wedetect_tpu.ops.yolov5 import yolov5_decode, yolov5_decode_level


def logit(p):
    return np.log(p / (1 - p))


def test_decode_center_cell():
    # one level 2x2, 1 anchor; all logits 0 -> sigmoid .5:
    # xy = (0.5*2-0.5+g)*s = (0.5+g)*s, wh = 1*anchor
    pred = np.zeros((1, 2, 2, 1, 6), np.float32)
    boxes, scores = yolov5_decode_level(
        jnp.asarray(pred), [(10, 20)], stride=8)
    b = np.asarray(boxes)[0]
    # cell (0,0): center (4, 4); box 10x20
    np.testing.assert_allclose(b[0], [4 - 5, 4 - 10, 4 + 5, 4 + 10])
    # cell (0,1): center (12, 4)
    np.testing.assert_allclose(b[1], [12 - 5, -6, 17, 14])
    # score = sigmoid(0)*sigmoid(0) = .25
    np.testing.assert_allclose(np.asarray(scores), 0.25)


def test_decode_wh_range():
    # twh -> (sig*2)^2 in (0, 4): max 4x anchor
    pred = np.zeros((1, 1, 1, 1, 6), np.float32)
    pred[..., 2] = 20.0  # sigmoid ~1 -> wh = 4 * anchor_w
    boxes, _ = yolov5_decode_level(jnp.asarray(pred), [(10, 10)], 8)
    b = np.asarray(boxes)[0, 0]
    assert (b[2] - b[0]) == pytest.approx(40.0, rel=1e-3)
    assert (b[3] - b[1]) == pytest.approx(10.0, rel=1e-3)


def test_multi_level():
    preds = [jnp.asarray(np.zeros((2, s, s, 3, 85), np.float32))
             for s in (8, 4, 2)]
    boxes, scores = yolov5_decode(preds)
    n = 3 * (64 + 16 + 4)
    assert boxes.shape == (2, n, 4)
    assert scores.shape == (2, n, 80)
