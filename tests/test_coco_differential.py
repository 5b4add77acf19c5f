"""Differential test: eval/coco_map.CocoEvaluator vs the independent
tests/coco_oracle transcription of published COCOeval semantics, over
randomized scenes engineered to hit the classic silent-mismatch spots
(VERDICT r3 item 2): crowd absorption order, exact score ties, exact
IoU ties (integer boxes), duplicated detections, annotation areas that
differ from box areas (segmentation-area gating), per-image maxDets
capping, empty gt / empty det images, and all-crowd images.

Both the native C++ matcher and the pure-Python fallback inside
CocoEvaluator._eval_img are swept.
"""

import numpy as np
import pytest
from coco_oracle import CocoOracle

import wedetect_tpu.native as native_mod
from wedetect_tpu.eval.coco_map import CocoEvaluator


def make_scene(rng, n_classes, img_size=640, ties=False, ints=False):
    """One image: gts with crowd flags + annotation areas, dets mixing
    jittered-gt copies (IoU spread around the thresholds), random
    boxes, exact duplicates, and occasional wrong labels."""
    n_gt = int(rng.integers(0, 9))
    gtb, gtl, gtc, gta = [], [], [], []
    for _ in range(n_gt):
        # log-uniform sizes spanning small/medium/large area ranges
        w = float(np.exp(rng.uniform(np.log(4), np.log(250))))
        h = float(np.exp(rng.uniform(np.log(4), np.log(250))))
        x = float(rng.uniform(0, img_size - w))
        y = float(rng.uniform(0, img_size - h))
        box = [x, y, x + w, y + h]
        if ints:
            box = [float(round(v)) for v in box]
            if box[2] <= box[0]:
                box[2] = box[0] + 1
            if box[3] <= box[1]:
                box[3] = box[1] + 1
        gtb.append(box)
        gtl.append(int(rng.integers(0, n_classes)))
        gtc.append(bool(rng.random() < 0.25))
        barea = (box[2] - box[0]) * (box[3] - box[1])
        # annotation 'area' is the segmentation area upstream — gate
        # on it, not the box area, to catch area-source mixups
        gta.append(float(barea * rng.uniform(0.4, 1.05))
                   if rng.random() < 0.7 else float(barea))
    dtb, dts, dtl = [], [], []
    for i in range(n_gt):
        for _ in range(int(rng.integers(0, 3))):
            b = list(gtb[i])
            w, h = b[2] - b[0], b[3] - b[1]
            for j in range(4):
                b[j] += float(rng.normal(0, 0.18) * (w if j % 2 == 0
                                                     else h))
            if b[2] <= b[0]:
                b[2] = b[0] + 1
            if b[3] <= b[1]:
                b[3] = b[1] + 1
            if ints:
                b = [float(round(v)) for v in b]
                if b[2] <= b[0]:
                    b[2] = b[0] + 1
                if b[3] <= b[1]:
                    b[3] = b[1] + 1
            dtb.append(b)
            dtl.append(gtl[i] if rng.random() < 0.85
                       else int(rng.integers(0, n_classes)))
            dts.append(float(rng.uniform(0.05, 1.0)))
    for _ in range(int(rng.integers(0, 5))):
        w = float(np.exp(rng.uniform(np.log(4), np.log(250))))
        h = float(np.exp(rng.uniform(np.log(4), np.log(250))))
        x = float(rng.uniform(0, img_size - w))
        y = float(rng.uniform(0, img_size - h))
        dtb.append([x, y, x + w, y + h])
        dtl.append(int(rng.integers(0, n_classes)))
        dts.append(float(rng.uniform(0.05, 1.0)))
    # exact duplicates (same box, same label, tied or distinct score)
    for _ in range(int(rng.integers(0, 2))):
        if dtb:
            i = int(rng.integers(0, len(dtb)))
            dtb.append(list(dtb[i]))
            dtl.append(dtl[i])
            dts.append(dts[i] if rng.random() < 0.5
                       else float(rng.uniform(0.05, 1.0)))
    if ties:
        dts = [round(s * 5) / 5 for s in dts]
    return (np.asarray(gtb, np.float64).reshape(-1, 4),
            np.asarray(gtl, np.int64),
            np.asarray(gtc, bool),
            np.asarray(gta, np.float64),
            np.asarray(dtb, np.float64).reshape(-1, 4),
            np.asarray(dts, np.float64),
            np.asarray(dtl, np.int64))


def run_dataset(seed, n_images=9, n_classes=4, max_dets=100):
    rng = np.random.default_rng(seed)
    ties = bool(seed % 2)
    ints = bool((seed // 2) % 2)
    ev = CocoEvaluator(class_ids=range(n_classes), max_dets=max_dets)
    orc = CocoOracle(max_dets=max_dets)
    for i in range(n_images):
        gtb, gtl, gtc, gta, dtb, dts, dtl = make_scene(
            rng, n_classes, ties=ties, ints=ints)
        if i == n_images - 1:
            dtb, dts, dtl = (np.zeros((0, 4)), np.zeros(0),
                             np.zeros(0, np.int64))          # no dets
        if i == n_images - 2:
            gtb, gtl, gtc, gta = (np.zeros((0, 4)), np.zeros(0, np.int64),
                                  np.zeros(0, bool), np.zeros(0))
        if i == n_images - 3 and len(gtc):
            gtc[:] = True                                    # all crowd
        ev.add_image({"boxes": gtb, "labels": gtl, "iscrowd": gtc,
                      "areas": gta}, dtb, dts, dtl)
        orc.add_image(gtb, gtl, gtc, gta, dtb, dts, dtl)
    return ev.summarize(), orc.evaluate()


def assert_close(got, want, seed):
    for k in ("mAP", "AP50", "AP75", "APs", "APm", "APl"):
        g, w = got[k], want[k]
        assert (np.isnan(g) and np.isnan(w)) or abs(g - w) < 1e-7, \
            f"seed={seed} {k}: evaluator {g} vs oracle {w}"
    assert set(got["per_class"]) == set(want["per_class"]), seed
    for c in got["per_class"]:
        g, w = got["per_class"][c], want["per_class"][c]
        assert (np.isnan(g) and np.isnan(w)) or abs(g - w) < 1e-7, \
            f"seed={seed} class {c}: {g} vs {w}"


def test_differential_sweep_fast():
    for seed in range(6):
        got, want = run_dataset(seed)
        assert_close(got, want, seed)


def test_differential_maxdets_cap():
    # small cap forces the per-image top-K path (reference protocol
    # uses maxDets 100/300; the cap logic is identical, exercised
    # harder with 3)
    for seed in (3, 11):
        got, want = run_dataset(seed, max_dets=3)
        assert_close(got, want, seed)


def test_differential_python_fallback(monkeypatch):
    # same sweep through the pure-Python matcher (the native C++
    # matcher is bypassed) — both paths must match the oracle
    monkeypatch.setattr(native_mod, "coco_match",
                        lambda *a, **k: None)
    for seed in range(4):
        got, want = run_dataset(seed + 100)
        assert_close(got, want, seed + 100)


@pytest.mark.slow
def test_differential_sweep_full():
    for seed in range(6, 24):
        got, want = run_dataset(seed)
        assert_close(got, want, seed)
