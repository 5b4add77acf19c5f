"""Dynamic int8 matmul/conv (ops/int8.py) and the quantized detect path.

Mechanics are pinned the same way tests/test_quant.py pins the decode
quantizer: at power-of-two scales, int8 quantize->dot->rescale equals
the float dot of the pre-rounded operands BITWISE (power-of-two scaling
commutes with FP rounding). Detector-level accuracy is pinned
statistically: quantized vs float logits/boxes on a random-init tiny
detector.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from wedetect_tpu.ops.int8 import (_quantize, quant_conv_general,
                                   quant_dot_general)

DENSE_DN = (((1,), (0,)), ((), ()))


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    x8, s = _quantize(jnp.asarray(x), axes=-1)
    assert x8.dtype == jnp.int8
    err = np.abs(np.asarray(x8, np.float32) * np.asarray(s) - x)
    # absmax quantization error is bounded by scale/2 per element
    assert np.all(err <= np.asarray(s) / 2 + 1e-7)
    # the row max hits 127 exactly
    assert np.all(np.max(np.abs(np.asarray(x8)), axis=-1) == 127)


def test_dot_bitwise_at_pow2_scales():
    """With operands already int8-valued and scaled by powers of two,
    the int8 path must equal the f32 dot bitwise."""
    rng = np.random.default_rng(1)
    li = rng.integers(-127, 128, (32, 48)).astype(np.float32)
    ri = rng.integers(-127, 128, (48, 24)).astype(np.float32)
    # force row/col absmax to 127 so amax = 127 * 2^k and the dynamic
    # scale amax/127 is exactly the power of two 2^k; multiplying f32
    # by a power of two is rounding-free, so the rescale is exact
    li[:, 0] = 127 * np.sign(li[:, 0] + 0.5)
    ri[0, :] = 127 * np.sign(ri[0, :] + 0.5)
    ls = 2.0 ** rng.integers(-6, 4, (32, 1)).astype(np.float32)
    rs = 2.0 ** rng.integers(-6, 4, (1, 24)).astype(np.float32)
    lhs = jnp.asarray(li * ls)
    rhs = jnp.asarray(ri * rs)
    got = quant_dot_general(lhs, rhs, DENSE_DN)
    want = (jnp.asarray(li) @ jnp.asarray(ri)) * jnp.asarray(ls * rs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dot_accuracy_random():
    rng = np.random.default_rng(2)
    lhs = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    rhs = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    got = np.asarray(quant_dot_general(lhs, rhs, DENSE_DN))
    want = np.asarray(lhs @ rhs)
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.9995
    assert np.max(np.abs(got - want)) < 0.05 * np.max(np.abs(want))


def test_dot_rejects_general_contractions():
    lhs = jnp.zeros((4, 8))
    rhs = jnp.zeros((8, 4))
    with pytest.raises(NotImplementedError):
        quant_dot_general(lhs, rhs, (((0,), (1,)), ((), ())))


def test_conv_matches_float_conv():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 12)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    got = np.asarray(quant_conv_general(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn))
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn))
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999


def test_conv_grouped_falls_back_to_float():
    """Depthwise convs must go through the exact float op."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 1, 6)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    got = np.asarray(quant_conv_general(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        feature_group_count=6))
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        feature_group_count=6))
    np.testing.assert_array_equal(got, want)


def test_dense_with_quant_dot():
    """flax Dense wired with quant_dot_general: bias still applies."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    d = nn.Dense(16, dot_general=quant_dot_general)
    v = d.init(jax.random.PRNGKey(0), x)
    got = np.asarray(d.apply(v, x))
    want = np.asarray(
        quant_dot_general(x, v["params"]["kernel"], DENSE_DN)
        + v["params"]["bias"])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def _tiny_cfg(quant):
    from wedetect_tpu.configs import ModelCfg, TestCfg
    return ModelCfg(name="tiny", depths=(1, 1, 2, 1),
                    dims=(16, 32, 64, 128), neck_scale=0.25,
                    neck_repeats=1, head_in_channels=(16, 32, 64),
                    embed_dims=32, img_size=(64, 64), num_classes=4,
                    quant_int8=quant, test=TestCfg(nms_pre=256,
                                                   max_per_img=16))


def test_int8_ref_prefill_tracks_float():
    """RefCfg.quant_int8 quantizes the decoder/ViT prefill matmuls:
    object logits must track the float scoring path on a tiny config."""
    from wedetect_tpu.models.ref import RefModules, ref_score_step
    from wedetect_tpu.nn.qwen3vl import (RefCfg, RefTextCfg,
                                         RefVisionCfg,
                                         get_rope_index_single_image)
    import dataclasses

    cfg = RefCfg(
        vision=RefVisionCfg(depth=2, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(0, 1)),
        text=RefTextCfg(vocab_size=128, hidden=48, layers=2, heads=4,
                        kv_heads=2, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=120, vision_start_token_id=122,
        object_token_id=123)
    rng = np.random.default_rng(7)
    gh = gw = 8
    n_img = (gh // 2) * (gw // 2)
    n_obj = 3
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    boxes = np.array([[4, 4, 60, 40], [10, 8, 90, 60],
                      [0, 0, 30, 30]], np.float32)
    seq = np.concatenate([np.array([1, 2, 122]), np.full(n_img, 120),
                          np.array([7, 9]), np.full(n_obj, 123),
                          np.array([2])]).astype(np.int32)
    b, l = 2, len(seq)
    ids = np.tile(seq[None], (b, 1))
    mask = np.ones((b, l), np.int32)
    pos = np.tile(get_rope_index_single_image(seq, 120, gh, gw, 2)
                  [:, None], (1, b, 1)).astype(np.int32)
    objpos = np.tile(np.nonzero(seq == 123)[0][None],
                     (b, 1)).astype(np.int32)
    ow_oh = np.array([96.0, 64.0], np.float32)

    variables = RefModules(cfg, gh, gw).init(
        jax.random.PRNGKey(0), patches, ids, mask, pos, boxes,
        ow_oh, 3, objpos)
    params = variables["params"]
    args = (jnp.asarray(patches), jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pos), 3, jnp.asarray(boxes),
            jnp.asarray(ow_oh), jnp.asarray(objpos))
    want = np.asarray(ref_score_step(cfg, gh, gw, params, *args))
    cfg_q = dataclasses.replace(cfg, quant_int8=True)
    got = np.asarray(ref_score_step(cfg_q, gh, gw, params, *args))
    assert got.shape == want.shape
    # tiny 2+2-layer stack: int8 noise stays small and must not
    # reorder the per-row proposal ranking
    np.testing.assert_allclose(got, want, atol=0.15)
    assert np.array_equal(np.argsort(got, -1), np.argsort(want, -1))


@pytest.mark.slow
def test_int8_on_trained_weights():
    """Accuracy on TRAINED weights (the metric that matters): train the
    mini detector to localize colored blocks, then require the int8
    graph to produce the same top detection (label + box) as the float
    graph on held-out samples. Random-weight score deltas overstate
    int8 noise (tests/test_real_image_parity.py pins that bound); this
    pins the post-training ranking behavior."""
    import dataclasses

    from test_detector import mini_cfg
    from wedetect_tpu.models.wedetect import detect_step, init_variables
    from wedetect_tpu.train.loop import (TrainLoopCfg,
                                         make_batch_iterator,
                                         run_training)
    from wedetect_tpu.train.optimizer import make_optimizer
    from wedetect_tpu.train.train_step import TrainState

    cfg = mini_cfg(num_classes=2)
    rng0 = np.random.default_rng(0)
    w_emb = rng0.standard_normal((2, cfg.embed_dims)).astype(np.float32)
    w_emb /= np.linalg.norm(w_emb, axis=-1, keepdims=True)

    def sample_fn(rng):
        img = np.full((64, 64, 3), 30, np.uint8)
        cls = int(rng.integers(0, 2))
        x, y = int(rng.integers(4, 30)), int(rng.integers(4, 30))
        bw, bh = int(rng.integers(16, 30)), int(rng.integers(16, 30))
        img[y:y + bh, x:x + bw] = ((220, 40, 40) if cls == 0
                                   else (40, 220, 40))
        return {"image": img,
                "gt_bboxes": np.array([[x, y, x + bw, y + bh]],
                                      np.float32),
                "gt_labels": np.array([cls], np.int64),
                "texts": ["red", "green"]}

    variables = init_variables(cfg, seed=0)
    tx = make_optimizer(variables["params"], base_lr=2e-3)
    state = TrainState.create(variables, tx)
    loop_cfg = TrainLoopCfg(steps=60, batch_size=4, log_every=60)
    batches = make_batch_iterator(cfg, loop_cfg, sample_fn,
                                  lambda texts: w_emb, seed=0,
                                  num_workers=2)
    state = run_training(cfg, state, batches, loop_cfg,
                         log_fn=lambda s, m: None)
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    cfg_q = dataclasses.replace(cfg, quant_int8=True)
    n = 8
    rng = np.random.default_rng(42)
    samples = [sample_fn(rng) for _ in range(n)]
    imgs = jnp.asarray(np.stack([s["image"] for s in samples]))
    w = jnp.asarray(w_emb)
    sf = jnp.ones((n, 2), jnp.float32)
    pad = jnp.zeros((n, 4), jnp.float32)
    ori = jnp.full((n, 2), 64.0, jnp.float32)
    det_f = detect_step(cfg, trained, imgs, w, sf, pad, ori)
    det_q = detect_step(cfg_q, trained, imgs, w, sf, pad, ori)

    agree = 0
    for i in range(n):
        bf, bq = np.asarray(det_f.boxes[i, 0]), np.asarray(det_q.boxes[i, 0])
        ix1, iy1 = np.maximum(bf[:2], bq[:2])
        ix2, iy2 = np.minimum(bf[2:], bq[2:])
        inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
        area = lambda b: max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
        iou = inter / max(area(bf) + area(bq) - inter, 1e-9)
        same_label = (int(det_f.labels[i, 0]) == int(det_q.labels[i, 0]))
        agree += int(same_label and iou > 0.85)
    assert agree >= n - 1, agree
    # top-1 confidence tracks within a few points after training
    np.testing.assert_allclose(np.asarray(det_q.scores[:, 0]),
                               np.asarray(det_f.scores[:, 0]), atol=0.06)


def test_quantized_detector_agrees_with_float():
    """detect_step with quant_int8: same weights, quantized backbone
    MLPs — top detections must agree with the float graph."""
    from wedetect_tpu.models.wedetect import detect_step, init_variables

    cfg_f = _tiny_cfg(False)
    cfg_q = _tiny_cfg(True)
    variables = init_variables(cfg_f, seed=0)
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.integers(0, 256, (1, 64, 64, 3)), jnp.uint8)
    w = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    sf = jnp.ones((1, 2), jnp.float32)
    pad = jnp.zeros((1, 4), jnp.float32)
    ori = jnp.asarray([[64.0, 64.0]])

    det_f = detect_step(cfg_f, variables, img, w, sf, pad, ori)
    det_q = detect_step(cfg_q, variables, img, w, sf, pad, ori)

    nf = int(np.sum(np.asarray(det_f.valid)))
    nq = int(np.sum(np.asarray(det_q.valid)))
    # same detection count (random-init scores sit far from the
    # threshold, so the int8 perturbation must not flip any)
    assert nf == nq and nf > 0
    top = min(nf, 5)
    bf = np.asarray(det_f.boxes[0, :top])
    bq = np.asarray(det_q.boxes[0, :top])
    sf_ = np.asarray(det_f.scores[0, :top])
    sq = np.asarray(det_q.scores[0, :top])
    assert np.array_equal(np.asarray(det_f.labels[0, :top]),
                          np.asarray(det_q.labels[0, :top]))
    np.testing.assert_allclose(sq, sf_, atol=0.02)
    np.testing.assert_allclose(bq, bf, atol=1.5)  # px

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
