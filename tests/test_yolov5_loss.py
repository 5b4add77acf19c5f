"""Golden parity: JAX YOLOv5 legacy loss vs the reference torch head.

Imports the actual reference yolov5_head.py (mmdet/mmengine stubbed
out, losses built from the reference iou_loss.py) and compares
loss_by_feat against wedetect_tpu.train.yolov5_loss on random
predictions + gt boxes, three seeds.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from wedetect_tpu.nn.yolov5_head import YOLOv5HeadModule  # noqa: E402
from wedetect_tpu.train.yolov5_loss import yolov5_loss  # noqa: E402

pytestmark = [pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted"), pytest.mark.slow]


def _stub_modules(iou_loss_mod):
    """Install minimal mmdet/mmengine stubs for yolov5_head.py."""
    import torch.nn as nn
    import torch.nn.functional as F

    class CrossEntropyLoss(nn.Module):
        def __init__(self, use_sigmoid=True, reduction="mean",
                     loss_weight=1.0, **_):
            super().__init__()
            self.loss_weight = loss_weight

        def forward(self, pred, target):
            return self.loss_weight * F.binary_cross_entropy_with_logits(
                pred, target, reduction="mean")

    class _PriorGen:
        def __init__(self, base_sizes, strides):
            self.base_sizes = base_sizes
            self.num_base_priors = [len(b) for b in base_sizes]

    class _Models:
        def build(self, cfg):
            t = cfg["type"]
            kw = {k: v for k, v in cfg.items() if k != "type"}
            if t == "mmdet.CrossEntropyLoss":
                return CrossEntropyLoss(**kw)
            if t == "IoULoss":
                return iou_loss_mod.mmyoloIoULoss(**kw)
            if t == "_head_module":
                return types.SimpleNamespace(**kw)
            raise KeyError(t)

        def register_module(self, *a, **k):
            return lambda cls: cls

    class _TaskUtils:
        def build(self, cfg):
            if "AnchorGenerator" in cfg["type"]:
                return _PriorGen(cfg["base_sizes"], cfg["strides"])
            return object()

        def register_module(self, *a, **k):
            return lambda cls: cls

    mods = {}

    def mk(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        mods[name] = m
        return m

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

        def init_weights(self):
            pass

    def weight_reduce_loss(loss, weight=None, reduction="mean",
                           avg_factor=None):
        if weight is not None:
            loss = loss * weight
        if avg_factor is None:
            return loss.mean() if reduction == "mean" else (
                loss.sum() if reduction == "sum" else loss)
        if reduction == "mean":
            return loss.sum() / avg_factor
        return loss

    mk("mmdet")
    mk("mmdet.models")
    mk("mmdet.models.losses")
    mk("mmdet.models.losses.utils",
       weight_reduce_loss=weight_reduce_loss)
    mk("mmdet.models.dense_heads")
    mk("mmdet.models.dense_heads.base_dense_head",
       BaseDenseHead=BaseModule)
    mk("mmdet.models.utils", filter_scores_and_topk=None,
       multi_apply=None)
    class HorizontalBoxes:
        @staticmethod
        def cxcywh_to_xyxy(t):
            cxcy, wh = t.split((2, 2), dim=-1)
            return torch.cat([cxcy - wh / 2, cxcy + wh / 2], dim=-1)

    mk("mmdet.structures")
    mk("mmdet.structures.bbox", bbox_overlaps=None,
       HorizontalBoxes=HorizontalBoxes)
    mk("mmdet.utils", ConfigType=dict, OptConfigType=dict,
       OptInstanceList=list, OptMultiConfig=dict)
    mk("mmdet.registry", MODELS=_Models(), TASK_UTILS=_TaskUtils())
    mk("mmengine")
    mk("mmengine.config", ConfigDict=dict)
    mk("mmengine.dist", get_dist_info=lambda: (0, 1))
    mk("mmengine.logging", print_log=lambda *a, **k: None)
    mk("mmengine.model", BaseModule=BaseModule)
    mk("mmengine.structures", InstanceData=object)
    return mods


def load_ref_head():
    import importlib.util

    saved = dict(sys.modules)
    losses_dir = os.path.join(REFERENCE_DIR, "wedetect", "models",
                              "losses")
    heads_dir = os.path.join(REFERENCE_DIR, "wedetect", "models",
                             "dense_heads")

    # iou_loss first (needs only the mmdet stubs)
    stub_names = None
    try:
        # temporary placeholder stubs so iou_loss imports (forced
        # assignment: other tests, e.g. test_assigner, leave partial
        # mmdet stubs behind; saved modules are restored in finally)
        pre = _stub_modules(None)
        stub_names = set(pre)
        for k, v in pre.items():
            sys.modules[k] = v
        spec = importlib.util.spec_from_file_location(
            "_ref_iou_loss", os.path.join(losses_dir, "iou_loss.py"))
        iou_loss_mod = importlib.util.module_from_spec(spec)
        sys.modules["_ref_iou_loss"] = iou_loss_mod
        spec.loader.exec_module(iou_loss_mod)

        # now the real stubs, with IoULoss wired into MODELS.build
        for k, v in _stub_modules(iou_loss_mod).items():
            sys.modules[k] = v

        pkg = types.ModuleType("_ref_v5_pkg")
        pkg.__path__ = [heads_dir]
        sys.modules["_ref_v5_pkg"] = pkg
        utils = types.ModuleType("_ref_v5_pkg.utils")
        utils.make_divisible = lambda x, w: max(
            int(round(x * w / 8)) * 8, 8) if x != 1 else x
        sys.modules["_ref_v5_pkg.utils"] = utils
        spec = importlib.util.spec_from_file_location(
            "_ref_v5_pkg.yolov5_head",
            os.path.join(heads_dir, "yolov5_head.py"))
        head_mod = importlib.util.module_from_spec(spec)
        sys.modules["_ref_v5_pkg.yolov5_head"] = head_mod
        spec.loader.exec_module(head_mod)
        return head_mod
    finally:
        for k in list(sys.modules):
            if (k not in saved and k != "_ref_v5_pkg.yolov5_head"
                    and (k.startswith("mmdet") or k.startswith("mmengine")
                         or k.startswith("_ref"))):
                sys.modules.pop(k, None)
        for k, v in saved.items():
            sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_head_cls():
    mod = load_ref_head()
    return mod.YOLOv5Head


def _make_head(ref_head_cls, num_classes):
    return ref_head_cls(
        head_module=dict(type="_head_module", num_classes=num_classes,
                         featmap_strides=[8, 16, 32]))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_v5_loss_parity(ref_head_cls, seed):
    rng = np.random.default_rng(seed)
    b, g, k = 2, 5, 7
    img_h = img_w = 640
    sizes = [(80, 80), (40, 40), (20, 20)]
    a = 3

    preds = [rng.standard_normal((b, h, w, a, 5 + k)).astype(np.float32)
             for h, w in sizes]

    cx = rng.uniform(40, 600, (b, g))
    cy = rng.uniform(40, 600, (b, g))
    bw = rng.uniform(8, 300, (b, g))
    bh = rng.uniform(8, 300, (b, g))
    x1 = np.clip(cx - bw / 2, 0, img_w)
    x2 = np.clip(cx + bw / 2, 0, img_w)
    y1 = np.clip(cy - bh / 2, 0, img_h)
    y2 = np.clip(cy + bh / 2, 0, img_h)
    boxes = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
    labels = rng.integers(0, k, (b, g))
    mask = np.ones((b, g), bool)
    mask[1, -2:] = False  # exercise padded rows

    # --- reference ---
    head = _make_head(ref_head_cls, k)
    rows = []
    for bi in range(b):
        for gi in range(g):
            if mask[bi, gi]:
                rows.append([bi, labels[bi, gi], *boxes[bi, gi]])
    gt_t = torch.tensor(rows, dtype=torch.float32)
    metas = [{"batch_input_shape": (img_h, img_w)}] * b

    cls_l, box_l, obj_l = [], [], []
    for p in preds:
        pt = torch.from_numpy(np.transpose(p, (0, 3, 4, 1, 2)))
        bs, _, attrib, h, w = pt.shape
        cls_l.append(pt[:, :, 5:].reshape(bs, -1, h, w))
        box_l.append(pt[:, :, :4].reshape(bs, -1, h, w))
        obj_l.append(pt[:, :, 4:5].reshape(bs, -1, h, w))
    ref = head.loss_by_feat(cls_l, box_l, obj_l, gt_t.clone(), metas)

    # --- ours ---
    got = yolov5_loss([jnp.asarray(p) for p in preds],
                      jnp.asarray(boxes), jnp.asarray(labels),
                      jnp.asarray(mask), (img_h, img_w),
                      loss_scale=float(b))

    np.testing.assert_allclose(float(got.cls),
                               float(ref["loss_cls"]), rtol=2e-4)
    np.testing.assert_allclose(float(got.bbox),
                               float(ref["loss_bbox"]), rtol=2e-4)
    np.testing.assert_allclose(float(got.obj),
                               float(ref["loss_obj"]), rtol=2e-4)


def test_v5_loss_empty_gt(ref_head_cls):
    rng = np.random.default_rng(3)
    b, k = 2, 7
    sizes = [(16, 16), (8, 8), (4, 4)]
    preds = [rng.standard_normal((b, h, w, 3, 5 + k)).astype(np.float32)
             for h, w in sizes]
    head = _make_head(ref_head_cls, k)
    cls_l, box_l, obj_l = [], [], []
    for p in preds:
        pt = torch.from_numpy(np.transpose(p, (0, 3, 4, 1, 2)))
        bs, _, attrib, h, w = pt.shape
        cls_l.append(pt[:, :, 5:].reshape(bs, -1, h, w))
        box_l.append(pt[:, :, :4].reshape(bs, -1, h, w))
        obj_l.append(pt[:, :, 4:5].reshape(bs, -1, h, w))
    ref = head.loss_by_feat(cls_l, box_l, obj_l,
                            torch.zeros((0, 6)), [
                                {"batch_input_shape": (128, 128)}] * b)

    got = yolov5_loss([jnp.asarray(p) for p in preds],
                      jnp.zeros((b, 4, 4)), jnp.zeros((b, 4), jnp.int32),
                      jnp.zeros((b, 4), bool), (128, 128),
                      loss_scale=float(b))
    assert float(got.cls) == 0.0 and float(got.bbox) == 0.0
    np.testing.assert_allclose(float(got.obj), float(ref["loss_obj"]),
                               rtol=2e-4)
    assert float(got.num_pos) == 0


def test_head_module_shapes_and_bias():
    import jax

    mod = YOLOv5HeadModule(num_classes=7, in_channels=(32, 64, 128))
    feats = [jnp.zeros((2, 16, 16, 32)), jnp.zeros((2, 8, 8, 64)),
             jnp.zeros((2, 4, 4, 128))]
    params = mod.init(jax.random.PRNGKey(0), feats)
    outs = mod.apply(params, feats)
    assert [o.shape for o in outs] == [(2, 16, 16, 3, 12),
                                       (2, 8, 8, 3, 12),
                                       (2, 4, 4, 3, 12)]
    # bias init: obj prior at stride 8 = log(8/(640/8)^2)
    bias = params["params"]["convs_pred_0"]["bias"]
    expect_obj = math.log(8 / 80 ** 2)
    expect_cls = math.log(0.6 / (7 - 0.999999))
    np.testing.assert_allclose(np.asarray(bias).reshape(3, 12)[:, 4],
                               expect_obj, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bias).reshape(3, 12)[:, 5],
                               expect_cls, rtol=1e-6)
    # raw zero-input logits decode through yolov5_decode
    from wedetect_tpu.ops.yolov5 import yolov5_decode
    boxes, scores = yolov5_decode(outs)
    assert boxes.shape == (2, 3 * (256 + 64 + 16), 4)
    assert scores.shape[-1] == 7


def test_v5_obj_scatter_collision(ref_head_cls):
    """Two gts assigned to the SAME (cell, prior) slots: our obj
    scatter is max-wins where torch's vectorized assignment is
    last-write-wins (PARITY.md note). Constructed so gt1's CIoU
    dominates at EVERY colliding slot (preds decode to gt1's box):
    ours must equal the torch ordering that writes gt1 last, and the
    opposite ordering pins a nonzero delta.
    """
    b, k = 1, 3
    img_h = img_w = 640
    sizes = [(80, 80), (40, 40), (20, 20)]
    strides = [8, 16, 32]
    a = 3

    center = 321.0      # same cell at every level for both gts
    g1_wh, g2_wh = 64.0, 150.0

    def box(wh):
        return [center - wh / 2, center - wh / 2,
                center + wh / 2, center + wh / 2]

    boxes = np.asarray([[box(g1_wh), box(g2_wh)]], np.float32)
    labels = np.asarray([[1, 2]])
    mask = np.ones((1, 2), bool)

    # preds: xy raw 0 (decodes to cell center-ish), wh raw solving
    # (sigmoid(w)*2)^2 * prior == gt1_wh -> CIoU(pred, gt1) ~ 1 at
    # every candidate, strictly above CIoU(pred, gt2).
    preds = []
    for (h, w), stride in zip(sizes, strides):
        p = np.zeros((b, h, w, a, 5 + k), np.float32)
        p[..., 4] = -5.0
        for ai in range(a):
            pw = DEFAULT_ANCHORS_LOCAL[strides.index(stride)][ai]
            for ch, prior in ((2, pw[0]), (3, pw[1])):
                s = math.sqrt(g1_wh / prior) / 2
                if 0 < s < 1:
                    p[..., ai, ch] = math.log(s / (1 - s))
                else:
                    p[..., ai, ch] = 10.0  # prior never matches gt1
        preds.append(p)

    def ref_obj(order):
        head = _make_head(ref_head_cls, k)
        rows = [[0, labels[0, gi], *boxes[0, gi]] for gi in order]
        cls_l, box_l, obj_l = [], [], []
        for p in preds:
            pt = torch.from_numpy(np.transpose(p, (0, 3, 4, 1, 2)))
            bs, _, _, h, w = pt.shape
            cls_l.append(pt[:, :, 5:].reshape(bs, -1, h, w))
            box_l.append(pt[:, :, :4].reshape(bs, -1, h, w))
            obj_l.append(pt[:, :, 4:5].reshape(bs, -1, h, w))
        out = head.loss_by_feat(
            cls_l, box_l, obj_l,
            torch.tensor(rows, dtype=torch.float32),
            [{"batch_input_shape": (img_h, img_w)}] * b)
        return float(out["loss_obj"])

    got = yolov5_loss([jnp.asarray(p) for p in preds],
                      jnp.asarray(boxes), jnp.asarray(labels),
                      jnp.asarray(mask), (img_h, img_w),
                      loss_scale=float(b))

    obj_g1_last = ref_obj([1, 0])   # dominant gt written last == max
    obj_g2_last = ref_obj([0, 1])
    # the collision is real: orderings disagree in torch
    assert abs(obj_g1_last - obj_g2_last) > 1e-7
    # scatter-max == last-write when the max is written last
    np.testing.assert_allclose(float(got.obj), obj_g1_last, rtol=2e-4)
    # pinned divergence for the other ordering
    delta = abs(float(got.obj) - obj_g2_last)
    np.testing.assert_allclose(delta, abs(obj_g1_last - obj_g2_last),
                               rtol=2e-4)


DEFAULT_ANCHORS_LOCAL = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
