"""Static NMS vs. a numpy greedy reference (torchvision-batched_nms
semantics: suppress same-class boxes with IoU strictly greater than the
threshold, keep in descending score order)."""

import numpy as np
import jax
import jax.numpy as jnp

from wedetect_tpu.ops.nms import batched_static_nms


def np_iou(b1, b2):
    lt = np.maximum(b1[:2], b2[:2])
    rb = np.minimum(b1[2:], b2[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    a1 = max(b1[2] - b1[0], 0) * max(b1[3] - b1[1], 0)
    a2 = max(b2[2] - b2[0], 0) * max(b2[3] - b2[1], 0)
    u = a1 + a2 - inter
    return inter / u if u > 0 else 0.0


def np_multilabel_nms(scores, boxes, score_thr, nms_pre, iou_thr, max_out):
    """Reference pipeline: filter_scores_and_topk + batched_nms."""
    a, k = scores.shape
    cand = []
    for i in range(a):
        for c in range(k):
            if scores[i, c] > score_thr:
                cand.append((scores[i, c], i, c))
    cand.sort(key=lambda t: -t[0])
    cand = cand[:nms_pre]
    kept = []
    for s, i, c in cand:
        ok = True
        for (ks, ki, kc) in kept:
            if kc == c and np_iou(boxes[i], boxes[ki]) > iou_thr:
                ok = False
                break
        if ok:
            kept.append((s, i, c))
            if len(kept) >= max_out:
                break
    return kept


def test_nms_matches_numpy_greedy(rng):
    a, k = 200, 5
    scores = rng.uniform(0, 1, (a, k)).astype(np.float32)
    xy = rng.uniform(0, 500, (a, 2))
    wh = rng.uniform(20, 120, (a, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)

    out = batched_static_nms(jnp.asarray(scores[None]),
                             jnp.asarray(boxes[None]),
                             score_thr=0.3, nms_pre=600, iou_thr=0.5,
                             max_out=50)
    ref = np_multilabel_nms(scores, boxes, 0.3, 600, 0.5, 50)

    n_valid = int(out.valid[0].sum())
    assert n_valid == len(ref)
    for slot, (s, i, c) in enumerate(ref):
        assert abs(float(out.scores[0, slot]) - s) < 1e-6
        assert int(out.anchors[0, slot]) == i
        assert int(out.labels[0, slot]) == c
        np.testing.assert_allclose(np.asarray(out.boxes[0, slot]), boxes[i],
                                   rtol=1e-6)


def test_nms_empty_and_padding(rng):
    # all scores below threshold -> zero valid slots
    scores = np.full((1, 50, 3), 0.0001, np.float32)
    boxes = np.tile(np.array([0, 0, 10, 10], np.float32), (1, 50, 1))
    out = batched_static_nms(jnp.asarray(scores), jnp.asarray(boxes),
                             score_thr=0.001, nms_pre=150, iou_thr=0.7,
                             max_out=10)
    assert int(out.valid.sum()) == 0
    assert (np.asarray(out.labels) == -1).all()


def test_nms_class_mask(rng):
    scores = rng.uniform(0.5, 1, (1, 20, 4)).astype(np.float32)
    xy = rng.uniform(0, 500, (20, 2))
    boxes = np.concatenate([xy, xy + 30], -1).astype(np.float32)[None]
    mask = jnp.asarray([True, True, False, False])
    out = batched_static_nms(jnp.asarray(scores), jnp.asarray(boxes),
                             score_thr=0.1, nms_pre=80, iou_thr=0.7,
                             max_out=40, class_mask=mask)
    labels = np.asarray(out.labels[0])[np.asarray(out.valid[0])]
    assert set(labels.tolist()) <= {0, 1}


def test_nms_single_label_mode(rng):
    scores = rng.uniform(0, 1, (1, 100, 6)).astype(np.float32)
    xy = rng.uniform(0, 500, (100, 2))
    boxes = np.concatenate([xy, xy + 40], -1).astype(np.float32)[None]
    out = batched_static_nms(jnp.asarray(scores), jnp.asarray(boxes),
                             score_thr=0.05, nms_pre=100, iou_thr=0.5,
                             max_out=20, multi_label=False)
    # single-label: each anchor appears at most once
    anchors = np.asarray(out.anchors[0])[np.asarray(out.valid[0])]
    assert len(anchors) == len(set(anchors.tolist()))
    # labels equal the argmax class of the anchor
    for slot in range(int(out.valid[0].sum())):
        anc = int(out.anchors[0, slot])
        assert int(out.labels[0, slot]) == int(scores[0, anc].argmax())


def test_tiled_multi_tile_equivalence(rng=np.random.default_rng(7)):
    """Small tile size forces cross-tile suppression paths."""
    from wedetect_tpu.ops.nms import _greedy_nms_tiled

    n = 100
    # clustered boxes so suppression chains cross tile boundaries
    centers = rng.uniform(20, 80, (10, 2))
    idx = rng.integers(0, 10, n)
    boxes = np.concatenate([
        centers[idx] + rng.uniform(-3, 3, (n, 2)),
        centers[idx] + 20 + rng.uniform(-3, 3, (n, 2))], axis=1
    ).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    order = np.argsort(-scores)
    boxes, scores = boxes[order], scores[order]
    labels = rng.integers(0, 2, n).astype(np.int32)
    anchors = np.arange(n, dtype=np.int32)

    # oracle: sequential greedy
    kept = []
    for i in range(n):
        if all(not (labels[i] == labels[j]
                    and np_iou(boxes[i], boxes[j]) > 0.5)
               for j in kept):
            kept.append(i)
    kept = kept[:16]

    kb, ks, kl, ka, kv = _greedy_nms_tiled(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.asarray(anchors), 0.5, 16, tile=8)
    got = np.asarray(ka)[np.asarray(kv)]
    np.testing.assert_array_equal(got, np.array(kept))


def test_topk_threshold_matches_topk():
    from wedetect_tpu.ops.nms import _topk_threshold

    rng = np.random.default_rng(11)
    n, k = 1 << 19, 3000
    flat = rng.uniform(0, 1, n).astype(np.float32)
    flat[rng.choice(n, n // 2, replace=False)] = -np.inf  # masked
    want_v, want_i = jax.lax.top_k(jnp.asarray(flat), k)
    got_v, got_i = _topk_threshold(jnp.asarray(flat), k)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i),
                                  np.asarray(want_i))


def test_topk_threshold_fewer_than_k():
    from wedetect_tpu.ops.nms import _topk_threshold

    flat = np.full(1 << 18, -np.inf, np.float32)
    flat[7] = 0.9
    flat[11] = 0.5
    v, i = _topk_threshold(jnp.asarray(flat), 100)
    v, i = np.asarray(v), np.asarray(i)
    assert v[0] == np.float32(0.9) and i[0] == 7
    assert v[1] == np.float32(0.5) and i[1] == 11
    assert (v[2:] == -np.inf).all()
