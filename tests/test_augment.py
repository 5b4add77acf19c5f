"""Tests for training augmentations and the class-aware sampler."""

import numpy as np
import pytest

from wedetect_tpu.data.augment import (merge_mixed_texts, mixup2,
                                       mosaic4, random_load_text)
from wedetect_tpu.data.sampler import ClassAwareSampler


def make_sample(rng, n=3, size=80, label_range=10):
    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    ctr = rng.uniform(20, 60, (n, 2))
    wh = rng.uniform(10, 30, (n, 2))
    boxes = np.concatenate([np.clip(ctr - wh / 2, 0, None),
                            np.clip(ctr + wh / 2, None, size)],
                           -1).astype(np.float32)
    return {"image": img, "gt_bboxes": boxes,
            "gt_labels": rng.integers(0, label_range, n)}


def test_random_load_text():
    rng = np.random.default_rng(0)
    texts = [[f"c{i}", f"s{i}"] for i in range(30)]
    s = make_sample(rng, n=5, label_range=30)
    out = random_load_text(s, texts, rng, num_neg_samples=(5, 10),
                           max_num_samples=12)
    assert len(out["texts"]) <= 12
    # every surviving gt label indexes into the sampled text list
    assert (out["gt_labels"] < len(out["texts"])).all()
    # all positives kept (fewer than max)
    assert len(out["gt_bboxes"]) == 5
    for lab, orig in zip(out["gt_labels"], s["gt_labels"]):
        assert out["sampled_classes"][lab] == orig


def test_mosaic4():
    rng = np.random.default_rng(1)
    samples = [make_sample(rng) for _ in range(4)]
    out = mosaic4(samples, img_scale=64, rng=rng)
    assert out["image"].shape == (128, 128, 3)
    b = out["gt_bboxes"]
    assert (b >= 0).all() and (b <= 128).all()
    assert (b[:, 2:] - b[:, :2] > 0).all()
    assert len(out["gt_labels"]) == len(b)


def test_mixup2():
    rng = np.random.default_rng(2)
    a, b = make_sample(rng), make_sample(rng)
    out = mixup2(a, b, rng)
    assert out["image"].shape == a["image"].shape
    assert len(out["gt_bboxes"]) == 6


def test_merge_mixed_texts():
    s1 = {"gt_labels": np.array([0, 1]), "texts": ["cat", "dog"],
          "gt_bboxes": np.zeros((2, 4))}
    s2 = {"gt_labels": np.array([0, 1]), "texts": ["dog", "bird"],
          "gt_bboxes": np.zeros((2, 4))}
    union, out = merge_mixed_texts([s1, s2])
    assert union == ["cat", "dog", "bird"]
    np.testing.assert_array_equal(out[0]["gt_labels"], [0, 1])
    np.testing.assert_array_equal(out[1]["gt_labels"], [1, 2])


def test_class_aware_sampler():
    cat_to_idx = {0: [0, 1], 1: [2], 2: [3, 4, 5]}
    s = ClassAwareSampler(cat_to_idx, num_samples=300, seed=0)
    idx = list(s)
    assert len(idx) == 300
    counts = np.bincount(idx, minlength=6)
    # class-balanced: category 1's single image appears ~100 times,
    # category 0's two images ~50 each
    assert counts[2] > 80
    assert 30 < counts[0] < 70
    # deterministic per epoch, different across epochs
    assert list(s) == idx
    s.set_epoch(1)
    assert list(s) != idx
    # distributed split covers everything exactly once
    parts = []
    for r in range(3):
        sr = ClassAwareSampler(cat_to_idx, 300, seed=0, rank=r,
                               world_size=3)
        parts.extend(list(sr))
    assert sorted(parts) == sorted(idx)


def test_mosaic9():
    rng = np.random.default_rng(3)
    from wedetect_tpu.data.augment import mosaic9

    samples = [make_sample(rng) for _ in range(9)]
    out = mosaic9(samples, img_scale=64, rng=rng)
    assert out["image"].shape == (128, 128, 3)
    b = out["gt_bboxes"]
    assert (b >= 0).all() and (b <= 128).all()


def test_yolox_mixup():
    rng = np.random.default_rng(4)
    from wedetect_tpu.data.augment import yolox_mixup

    a, b = make_sample(rng, size=96), make_sample(rng, size=64)
    out = yolox_mixup(a, b, rng)
    assert out["image"].shape == a["image"].shape
    assert len(out["gt_bboxes"]) >= len(a["gt_bboxes"])
    bb = out["gt_bboxes"]
    assert (bb[:, 0::2] <= 96).all() and (bb >= 0).all()


def test_concat_repeat():
    from wedetect_tpu.data.concat import ConcatDetDataset, RepeatDataset

    class FakeDs:
        def __init__(self, n, texts, label):
            self.n, self.texts, self.label = n, texts, label

        def __len__(self):
            return self.n

        def sample(self, i):
            return {"gt_labels": np.array([self.label]),
                    "texts": self.texts, "idx": i}

    d1 = FakeDs(3, [["cat"], ["dog"]], 0)
    d2 = FakeDs(2, [["dog"], ["bird"]], 1)
    cat = ConcatDetDataset([d1, d2])
    assert len(cat) == 5
    assert cat.texts == ["cat", "dog", "dog", "bird"]
    assert cat.sample(3)["idx"] == 0       # second dataset
    ids = cat.get_cat_ids(0)               # label 0 in d1 -> "cat" -> 0
    assert ids == [0]
    ids2 = cat.get_cat_ids(4)              # label 1 in d2 -> "bird" -> 3
    assert ids2 == [3]
    table = cat.cat_to_indices()
    assert set(table[0]) == {0, 1, 2}
    rep = RepeatDataset(d2, 3)
    assert len(rep) == 6
    assert rep.sample(5)["idx"] == 1
