"""Differential test: eval/lvis_map.LvisEvaluator vs the independent
tests/lvis_oracle transcription of the published LVIS fixed-AP
protocol, over randomized scenes engineered to hit the LVIS-specific
semantics (VERDICT r4 next #4): per-image category domains
(neg_category_ids vs excluded categories), not-exhaustive ignore,
the dataset-wide per-class cap (small caps + exact score ties at the
cap boundary, where pre-match top-k and post-match thresholding
diverge), frequency-group averaging, and the COCO corners inherited
underneath (area gating, empty images, duplicates).

The fast sweep runs 10 seeds x 10 images = 100 scenes; the slow
sweep adds 12 more seeds (220 scenes total) — the same standard as
tests/test_coco_differential.py, which caught a real ulp bug.
"""

import numpy as np
import pytest
from lvis_oracle import LvisOracle

from wedetect_tpu.eval.lvis_map import LvisEvaluator


def make_lvis_scene(rng, n_classes, img_size=640, ties=False):
    """One LVIS image: positive classes with gts, a random negative
    set over absent classes, a random not-exhaustive subset of the
    positives, and dets mixing jittered gt copies, random boxes over
    ALL classes (in- and out-of-domain), and duplicates."""
    n_gt = int(rng.integers(0, 8))
    gtb, gtl, gta = [], [], []
    for _ in range(n_gt):
        w = float(np.exp(rng.uniform(np.log(4), np.log(250))))
        h = float(np.exp(rng.uniform(np.log(4), np.log(250))))
        x = float(rng.uniform(0, img_size - w))
        y = float(rng.uniform(0, img_size - h))
        gtb.append([x, y, x + w, y + h])
        gtl.append(int(rng.integers(0, n_classes)))
        barea = w * h
        gta.append(float(barea * rng.uniform(0.4, 1.05))
                   if rng.random() < 0.7 else float(barea))
    pos = set(gtl)
    absent = [c for c in range(n_classes) if c not in pos]
    neg = {c for c in absent if rng.random() < 0.5}
    nexh = {c for c in pos if rng.random() < 0.35}

    dtb, dts, dtl = [], [], []
    for i in range(n_gt):
        for _ in range(int(rng.integers(0, 3))):
            b = list(gtb[i])
            w, h = b[2] - b[0], b[3] - b[1]
            for j in range(4):
                b[j] += float(rng.normal(0, 0.18)
                              * (w if j % 2 == 0 else h))
            if b[2] <= b[0]:
                b[2] = b[0] + 1
            if b[3] <= b[1]:
                b[3] = b[1] + 1
            dtb.append(b)
            dtl.append(gtl[i] if rng.random() < 0.8
                       else int(rng.integers(0, n_classes)))
            dts.append(float(rng.uniform(0.05, 1.0)))
    # random boxes over ALL classes: out-of-domain ones must be
    # excluded, in-domain-negative ones must count as FPs
    for _ in range(int(rng.integers(0, 6))):
        w = float(np.exp(rng.uniform(np.log(4), np.log(250))))
        h = float(np.exp(rng.uniform(np.log(4), np.log(250))))
        x = float(rng.uniform(0, img_size - w))
        y = float(rng.uniform(0, img_size - h))
        dtb.append([x, y, x + w, y + h])
        dtl.append(int(rng.integers(0, n_classes)))
        dts.append(float(rng.uniform(0.05, 1.0)))
    for _ in range(int(rng.integers(0, 2))):      # duplicates
        if dtb:
            i = int(rng.integers(0, len(dtb)))
            dtb.append(list(dtb[i]))
            dtl.append(dtl[i])
            dts.append(dts[i] if rng.random() < 0.5
                       else float(rng.uniform(0.05, 1.0)))
    if ties:
        # coarse scores: exact ties WITHIN and ACROSS images — the
        # fixed-AP cap boundary must break them identically
        dts = [round(s * 5) / 5 for s in dts]
    return (np.asarray(gtb, np.float64).reshape(-1, 4),
            np.asarray(gtl, np.int64),
            np.asarray(gta, np.float64),
            np.asarray(dtb, np.float64).reshape(-1, 4),
            np.asarray(dts, np.float64),
            np.asarray(dtl, np.int64),
            neg, nexh)


def run_lvis_dataset(seed, n_images=10, n_classes=5, cap=10000):
    rng = np.random.default_rng(seed)
    ties = bool(seed % 2)
    freqs = {c: ("r", "c", "f")[int(rng.integers(0, 3))]
             for c in range(n_classes)}
    ev = LvisEvaluator(class_ids=range(n_classes), per_class_cap=cap,
                       frequencies=freqs)
    orc = LvisOracle(per_class_cap=cap, frequencies=freqs)
    for i in range(n_images):
        gtb, gtl, gta, dtb, dts, dtl, neg, nexh = make_lvis_scene(
            rng, n_classes, ties=ties)
        if i == n_images - 1:                     # no dets
            dtb, dts, dtl = (np.zeros((0, 4)), np.zeros(0),
                             np.zeros(0, np.int64))
        if i == n_images - 2:                     # no gt, negs only
            gtb, gtl, gta = (np.zeros((0, 4)),
                             np.zeros(0, np.int64), np.zeros(0))
            neg = {c for c in range(n_classes) if rng.random() < 0.5}
            nexh = set()
        ev.add_image({"boxes": gtb, "labels": gtl,
                      "iscrowd": np.zeros(len(gtb), bool),
                      "areas": gta}, dtb, dts, dtl,
                     neg_cats=neg, not_exhaustive=nexh)
        orc.add_image(gtb, gtl, gta, dtb, dts, dtl,
                      neg_cats=neg, not_exhaustive=nexh)
    return ev.summarize(), orc.evaluate()


KEYS = ("mAP", "AP50", "AP75", "APs", "APm", "APl",
        "APr", "APc", "APf")


def assert_close(got, want, seed):
    for k in KEYS:
        g, w = got.get(k, float("nan")), want.get(k, float("nan"))
        assert (np.isnan(g) and np.isnan(w)) or abs(g - w) < 1e-7, \
            f"seed={seed} {k}: evaluator {g} vs oracle {w}"
    assert set(got["per_class"]) == set(want["per_class"]), seed
    for c in got["per_class"]:
        g, w = got["per_class"][c], want["per_class"][c]
        assert (np.isnan(g) and np.isnan(w)) or abs(g - w) < 1e-7, \
            f"seed={seed} class {c}: {g} vs {w}"


def test_lvis_differential_sweep_fast():
    # 10 seeds x 10 images = 100 randomized LVIS scenes
    for seed in range(10):
        got, want = run_lvis_dataset(seed)
        assert_close(got, want, seed)


def test_lvis_differential_small_cap():
    # tiny dataset-wide caps: the cap boundary lands mid-stream and
    # (odd seeds) on exact score ties; pre-match top-k semantics and
    # the stable tiebreak are both load-bearing here
    for seed in (1, 3, 7, 12):
        for cap in (3, 8):
            got, want = run_lvis_dataset(seed + 1000 * cap, cap=cap)
            assert_close(got, want, seed + 1000 * cap)


def test_lvis_summarize_idempotent():
    ev, _ = None, None
    rng = np.random.default_rng(5)
    e = LvisEvaluator(class_ids=range(4), per_class_cap=6)
    for _ in range(4):
        gtb, gtl, gta, dtb, dts, dtl, neg, nexh = make_lvis_scene(
            rng, 4, ties=True)
        e.add_image({"boxes": gtb, "labels": gtl,
                     "iscrowd": np.zeros(len(gtb), bool),
                     "areas": gta}, dtb, dts, dtl,
                    neg_cats=neg, not_exhaustive=nexh)
    a, b = e.summarize(), e.summarize()
    for k in ("mAP", "AP50", "APs"):
        ga, gb = a[k], b[k]
        assert (np.isnan(ga) and np.isnan(gb)) or ga == gb


@pytest.mark.slow
def test_lvis_differential_sweep_full():
    # +120 scenes, mixed caps
    for seed in range(10, 22):
        cap = (4, 10, 10000)[seed % 3]
        got, want = run_lvis_dataset(seed, cap=cap)
        assert_close(got, want, seed)
