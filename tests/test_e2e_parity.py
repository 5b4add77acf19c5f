"""End-to-end golden parity: full WeDetect-Uni 'base' model vs the
reference SimpleYOLOWorldDetector with identical (random) weights.

North-star check (SURVEY.md §6): bit-comparable boxes/scores/embeddings
against generate_proposal.py's model on the same input tensor.
"""

import numpy as np
import pytest

from conftest import load_reference_standalone, reference_available

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from wedetect_tpu.ckpt import convert as C  # noqa: E402
from wedetect_tpu.configs import wedetect_uni  # noqa: E402
from wedetect_tpu.models.wedetect import forward_raw  # noqa: E402

pytestmark = [
    pytest.mark.skipif(not reference_available(),
                       reason="reference not mounted"),
    pytest.mark.slow,
]


def np_batched_nms(boxes, scores, labels, iou_thr):
    """torchvision batched_nms semantics for the reference driver."""
    order = np.argsort(-scores, kind="mergesort")
    kept = []
    for i in order:
        ok = True
        for j in kept:
            if labels[i] != labels[j]:
                continue
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            a1 = np.prod(np.clip(boxes[i, 2:] - boxes[i, :2], 0, None))
            a2 = np.prod(np.clip(boxes[j, 2:] - boxes[j, :2], 0, None))
            u = a1 + a2 - inter
            if u > 0 and inter / u > iou_thr:
                ok = False
                break
        if ok:
            kept.append(i)
    return np.asarray(kept, np.int64)


def test_uni_base_end_to_end():
    ref = load_reference_standalone()
    torch.manual_seed(0)
    model = ref.SimpleYOLOWorldDetector(
        backbone_size="base", prompt_dim=768, num_prompts=16,
        num_proposals=50)
    # randomize with small weights + sane BN stats
    g = torch.Generator().manual_seed(1)
    sd = model.state_dict()
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        if "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif "logit_scale" in k:
            sd[k] = torch.full(v.shape, -1.0)
        else:
            sd[k] = 0.05 * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)
    model.eval()

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (640, 640, 3)).astype(np.float32)
    x = torch.tensor(img.transpose(2, 0, 1)[None] / 255.0,
                     dtype=torch.float32)
    with torch.no_grad():
        feats = model.neck(model.backbone(x))
        # reference head_predict up to the flatten stage
        embeds, dists, logits = [], [], []
        for i in range(3):
            e, d, s = model.head_module_forward_single(
                feats[i], model.bbox_head.cls_preds[i],
                model.bbox_head.reg_preds[i],
                model.bbox_head.cls_contrasts[i])
            b = e.shape[0]
            embeds.append(e.permute(0, 2, 3, 1).reshape(b, -1, 768))
            dists.append(d.permute(0, 2, 3, 1).reshape(b, -1, 4))
            logits.append(s.permute(0, 2, 3, 1).reshape(b, -1, 16))
        want_embeds = torch.cat(embeds, 1).numpy()[0]
        want_scores = torch.cat(logits, 1).sigmoid().numpy()[0]
        want_dists = torch.cat(dists, 1).numpy()[0]

    cfg = wedetect_uni("base", num_prompts=16)
    sd_np = {k: v.numpy() for k, v in model.state_dict().items()}
    variables = C.convert_detector(sd_np, cfg)
    out = forward_raw(cfg, variables,
                      jnp.asarray(img[None].astype(np.uint8)), None)
    got_scores = np.asarray(out.scores[0])
    got_embeds = np.asarray(out.embeds[0])

    np.testing.assert_allclose(got_scores, want_scores, rtol=5e-3,
                               atol=2e-4)
    np.testing.assert_allclose(got_embeds, want_embeds, rtol=5e-3,
                               atol=5e-3)

    # decoded boxes: reference decode = priors +- dist*stride
    from wedetect_tpu.ops.priors import flat_priors_and_strides

    priors, strides = flat_priors_and_strides(
        cfg.feat_sizes(), cfg.strides)
    want_boxes = np.concatenate(
        [priors - want_dists[:, :2] * strides[:, None],
         priors + want_dists[:, 2:] * strides[:, None]], -1)
    got_boxes = np.asarray(out.boxes[0])
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-3,
                               atol=0.05)

    # kept proposals: same top-30000 + NMS pipeline
    flat = want_scores.reshape(-1)
    order = np.argsort(-flat, kind="mergesort")[:30000]
    anchors = order // 16
    labels = order % 16
    keep = np_batched_nms(want_boxes[anchors], flat[order], labels,
                          0.7)[:50]
    want_kept = want_boxes[anchors[keep]]

    from wedetect_tpu.ops.nms import batched_static_nms

    res = batched_static_nms(out.scores, out.boxes, score_thr=0.0,
                             nms_pre=30000, iou_thr=0.7, max_out=50)
    got_kept = np.asarray(res.boxes[0])[np.asarray(res.valid[0])]
    assert len(got_kept) == len(want_kept)
    np.testing.assert_allclose(got_kept, want_kept, rtol=1e-3,
                               atol=0.1)
