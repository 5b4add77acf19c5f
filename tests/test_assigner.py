"""Parity: JAX TAL assigner + losses vs the reference torch assigner."""

import os
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wedetect_tpu.train.assigner import assign  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")


def load_ref_assigner():
    """Import the reference assigner with mmdet stubbed out."""
    if "mmdet" not in sys.modules:
        mmdet = types.ModuleType("mmdet")
        registry = types.ModuleType("mmdet.registry")

        class _Reg:
            def register_module(self, *a, **k):
                def deco(cls):
                    return cls
                return deco

        registry.TASK_UTILS = _Reg()
        structures = types.ModuleType("mmdet.structures")
        bbox = types.ModuleType("mmdet.structures.bbox")
        bbox.HorizontalBoxes = object
        structures.bbox = bbox
        mmdet.registry = registry
        mmdet.structures = structures
        sys.modules.update({
            "mmdet": mmdet, "mmdet.registry": registry,
            "mmdet.structures": structures,
            "mmdet.structures.bbox": bbox,
        })
    pkg_dir = os.path.join(REFERENCE_DIR, "wedetect", "models", "assigner")
    import importlib.util

    # fake package so the relative `.utils` import resolves
    pkg = types.ModuleType("_ref_assigner_pkg")
    pkg.__path__ = [pkg_dir]
    sys.modules["_ref_assigner_pkg"] = pkg
    for name, fname in (("utils", "utils.py"),
                        ("bta", "batch_task_aligned_assigner.py")):
        spec = importlib.util.spec_from_file_location(
            f"_ref_assigner_pkg.{name}", os.path.join(pkg_dir, fname))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_ref_assigner_pkg.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["_ref_assigner_pkg.bta"]


def make_case(rng, b=2, g=5, k=7):
    """Realistic case: grid priors + decoded-style pred boxes, gts that
    always contain anchors. Avoids the degenerate all-zero-metric tie
    where the reference's torch.topk order is arbitrary (matching
    arbitrary tie-breaking is not a behavior worth replicating)."""
    from wedetect_tpu.ops.priors import flat_priors_and_strides

    priors, stride_vec = flat_priors_and_strides(
        [(8, 8), (4, 4), (2, 2)], [8, 16, 32])
    a = priors.shape[0]
    # pred boxes decoded around each prior with positive ltrb distances
    dists = rng.uniform(0.5, 3.0, (b, a, 4)).astype(np.float32) * \
        stride_vec[None, :, None]
    pred_bboxes = np.concatenate(
        [priors[None] - dists[..., :2], priors[None] + dists[..., 2:]],
        axis=-1).astype(np.float32)
    pred_scores = rng.uniform(0, 1, (b, a, k)).astype(np.float32)
    gt_bboxes = np.zeros((b, g, 4), np.float32)
    gt_labels = np.zeros((b, g), np.int64)
    gt_mask = np.zeros((b, g), bool)
    for i in range(b):
        n = rng.integers(1, g + 1)
        ctr = rng.uniform(16, 48, (n, 2))
        wh = rng.uniform(18, 44, (n, 2))
        gt_bboxes[i, :n] = np.concatenate(
            [np.clip(ctr - wh / 2, 0, None),
             np.clip(ctr + wh / 2, None, 64)], -1).astype(np.float32)
        gt_labels[i, :n] = rng.integers(0, k, n)
        gt_mask[i, :n] = True
    strides = stride_vec[:, None]
    return (priors, strides, pred_bboxes, pred_scores, gt_bboxes,
            gt_labels, gt_mask)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_assigner_parity(seed):
    rng = np.random.default_rng(seed)
    (priors, strides, pred_bboxes, pred_scores, gt_bboxes, gt_labels,
     gt_mask) = make_case(rng)
    bta = load_ref_assigner()
    ref = bta.BatchTaskAlignedAssigner(
        num_classes=7, topk=10, alpha=0.5, beta=6.0, eps=1e-9,
        use_ciou=True)
    with torch.no_grad():
        want = ref(
            torch.tensor(pred_bboxes), torch.tensor(pred_scores),
            torch.tensor(np.concatenate(
                [priors, strides, strides], -1)),
            torch.tensor(gt_labels)[..., None].float(),
            torch.tensor(gt_bboxes),
            torch.tensor(gt_mask[..., None]).float())

    got = assign(jnp.asarray(pred_bboxes), jnp.asarray(pred_scores),
                 jnp.asarray(priors), jnp.asarray(gt_labels.astype(
                     np.int32)), jnp.asarray(gt_bboxes),
                 jnp.asarray(gt_mask), num_classes=7, topk=10,
                 alpha=0.5, beta=6.0, eps=1e-9)

    np.testing.assert_array_equal(
        np.asarray(got.fg_mask),
        want["fg_mask_pre_prior"].numpy().astype(bool))
    fg = np.asarray(got.fg_mask)
    np.testing.assert_allclose(
        np.asarray(got.bboxes)[fg],
        want["assigned_bboxes"].numpy()[fg], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got.scores), want["assigned_scores"].numpy(),
        rtol=1e-4, atol=1e-5)
