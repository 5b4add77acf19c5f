"""WeDetect / WeDetect-Uni detector: the single jit-compiled detect graph.

Behavioral spec: reference wedetect/models/detectors/yolo_world.py:12-260
(YOLOWorldDetector / SimpleYOLOWorldDetector) + the predict path of
wedetect/models/dense_heads/yolo_world_head.py:578-749 and
generate_proposal.py:1082-1218.

Design (TPU-native): ONE static-shape graph
    uint8 NHWC image -> /255 -> ConvNeXt -> BiFPAN -> head ->
    similarity matmul -> decode (DFL * stride, distance2bbox) ->
    sigmoid -> static top-k + class-aware NMS -> un-letterbox -> clamp
All shapes (image size, K classes, anchors A, max detections) are
compile-time constants from ModelCfg. The text tower runs separately
(`reparameterize`) and its (K, C) output is a cached input to this
graph. Priors are numpy constants baked in at trace time.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wedetect_tpu.configs import ModelCfg
from wedetect_tpu.nn.bifpan import CSPRepBiFPANNeck
from wedetect_tpu.nn.convnext import ConvNeXt
from wedetect_tpu.nn.head import HeadOutputs, WeDetectHead
from wedetect_tpu.ops.boxes import distance2bbox
from wedetect_tpu.ops.nms import (NMSResult, batched_static_nms,
                                  nms_labeled)
from wedetect_tpu.ops.priors import flat_priors_and_strides


class DetectorOutputs(NamedTuple):
    """Raw decoded per-anchor outputs (before NMS)."""

    scores: jax.Array   # (B, A, K) post-sigmoid
    boxes: jax.Array    # (B, A, 4) xyxy in letterboxed-image pixels
    embeds: jax.Array   # (B, A, C) post-BN region embeddings
    logits: jax.Array   # (B, A, K) pre-sigmoid
    dist_logits: jax.Array  # (B, A, 4, reg_max)


class Detections(NamedTuple):
    """Final fixed-slot detections in original-image coordinates."""

    boxes: jax.Array    # (B, max_out, 4)
    scores: jax.Array   # (B, max_out)
    labels: jax.Array   # (B, max_out) int32, -1 for empty slots
    embeds: jax.Array   # (B, max_out, C) region embedding per detection
    anchors: jax.Array  # (B, max_out) int32 source anchor index
    valid: jax.Array    # (B, max_out) bool


class WeDetectModule(nn.Module):
    """backbone + neck + head as one flax module."""

    cfg: ModelCfg
    bn_axis_name: Optional[str] = None

    def setup(self):
        c = self.cfg
        dt = c.dtype
        self.backbone = ConvNeXt(depths=c.depths, dims=c.dims,
                                 drop_path_rate=c.drop_path_rate,
                                 dtype=dt, quant=c.quant_int8,
                                 name="backbone")
        if c.backbone_down_proj:
            # xlarge c4 1x1 down-projection (reference
            # mm_backbone.py:278-301, down_mlp Conv2d(2048, 1024, 1))
            self.down_mlp = nn.Dense(c.backbone_down_proj,
                                     dtype=dt, name="down_mlp")
        self.neck = CSPRepBiFPANNeck(scale=c.neck_scale,
                                     repeats=c.neck_repeats, dtype=dt,
                                     bn_axis_name=self.bn_axis_name,
                                     quant=c.quant_int8,
                                     name="neck")
        self.head = WeDetectHead(embed_dims=c.embed_dims,
                                 reg_max=c.reg_max,
                                 use_bn_head=c.use_bn_head, dtype=dt,
                                 bn_axis_name=self.bn_axis_name,
                                 quant=c.quant_int8,
                                 name="head")
        if c.num_prompts:
            # WeDetect-Uni learned objectness prompt bank
            # (reference: generate_proposal.py:1076-1078).
            self.embeddings = self.param(
                "embeddings",
                lambda key, shape: _normed_init(key, shape),
                (c.num_prompts, c.embed_dims))
            if c.use_mlp_adapter:
                # residual MLP adapter + L2 norm
                # (reference: yolo_world.py:160-165, 249-252)
                self.adapter_fc1 = nn.Dense(2 * c.embed_dims,
                                            name="adapter_fc1")
                self.adapter_fc2 = nn.Dense(c.embed_dims,
                                            name="adapter_fc2")

    def __call__(self, images, w=None, train: bool = False) -> HeadOutputs:
        """images: (B, H, W, 3) float in [0,1]; w: (K, C) or (B, K, C).

        For the Uni variant (num_prompts > 0) `w` defaults to the
        learned prompt bank, used UN-normalized
        (reference: generate_proposal.py:1130).
        """
        c = self.cfg
        normalize_w = True
        if w is None:
            assert c.num_prompts, "text embeddings required"
            w = self.embeddings
            if c.use_mlp_adapter:
                a = self.adapter_fc2(jax.nn.relu(self.adapter_fc1(w)))
                w = w + a
                w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
            else:
                # standalone Uni path uses the raw bank
                normalize_w = False
        feats = self.backbone(images.astype(c.dtype),
                              deterministic=not train)
        if c.backbone_down_proj:
            feats = feats[:3] + (self.down_mlp(feats[3]),)
        p3, p4, p5 = self.neck(feats, train=train)
        return self.head((p3, p4, p5), w, train=train,
                         normalize_w=normalize_w)


def _normed_init(key, shape):
    e = jax.random.normal(key, shape, jnp.float32)
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


def decode_outputs(cfg: ModelCfg, out: HeadOutputs,
                   img_size: Optional[Tuple[int, int]] = None
                   ) -> DetectorOutputs:
    """Head outputs -> per-anchor scores/boxes in letterboxed pixels.

    Matches predict_by_feat's decode: dist * stride, distance2bbox
    against (x+.5)*s priors (reference:
    generate_proposal.py:1164-1195).
    """
    priors, strides = flat_priors_and_strides(
        cfg.feat_sizes(img_size), cfg.strides)
    priors = jnp.asarray(priors)
    strides = jnp.asarray(strides)
    dists = out.dists.astype(jnp.float32) * strides[None, :, None]
    boxes = distance2bbox(priors[None], dists)
    scores = jax.nn.sigmoid(out.logits.astype(jnp.float32))
    return DetectorOutputs(scores=scores, boxes=boxes, embeds=out.embeds,
                           logits=out.logits, dist_logits=out.dist_logits)


def postprocess(cfg: ModelCfg, dec: DetectorOutputs,
                scale_factor: jax.Array, pad_param: jax.Array,
                ori_shape: jax.Array,
                class_mask: Optional[jax.Array] = None) -> Detections:
    """Static NMS + un-letterbox + clamp, all inside the graph.

    scale_factor: (B, 2) (w_ratio, h_ratio); pad_param: (B, 4)
    [top, bottom, left, right]; ori_shape: (B, 2) (h, w).
    Matches the reference rescale path (bboxes -= [left, top]; /= ratio;
    clamp to ori_shape — generate_proposal.py:1106-1115,
    wedetect/models/dense_heads/yolov5_head.py 'pad_param' branch).
    """
    t = cfg.test
    res = batched_static_nms(
        dec.scores, dec.boxes, score_thr=t.score_thr, nms_pre=t.nms_pre,
        iou_thr=t.nms_iou_thr, max_out=t.max_per_img,
        class_mask=class_mask, multi_label=t.multi_label)
    offs = jnp.stack([pad_param[:, 2], pad_param[:, 0],
                      pad_param[:, 2], pad_param[:, 0]], axis=-1)
    boxes = res.boxes - offs[:, None, :]
    sf = jnp.concatenate([scale_factor, scale_factor], axis=-1)
    boxes = boxes / sf[:, None, :]
    wh_max = jnp.stack([ori_shape[:, 1], ori_shape[:, 0],
                        ori_shape[:, 1], ori_shape[:, 0]], axis=-1)
    boxes = jnp.clip(boxes, 0.0, wh_max[:, None, :])
    embeds = jnp.take_along_axis(
        dec.embeds, jnp.clip(res.anchors, 0)[..., None],
        axis=1).astype(jnp.float32)
    return Detections(boxes=boxes, scores=res.scores, labels=res.labels,
                      embeds=embeds, anchors=res.anchors,
                      valid=res.valid)


@functools.partial(jax.jit, static_argnums=(0,))
def detect_step(cfg: ModelCfg, variables, images_u8, w, scale_factor,
                pad_param, ori_shape, class_mask=None) -> Detections:
    """The full jitted inference step.

    images_u8: (B, H, W, 3) uint8 RGB letterboxed images.
    w: (K, C) text/prompt embeddings (None only for Uni).
    """
    images = images_u8.astype(jnp.float32) / 255.0
    out = WeDetectModule(cfg).apply(variables, images, w)
    dec = decode_outputs(cfg, out, images_u8.shape[1:3])
    return postprocess(cfg, dec, scale_factor, pad_param, ori_shape,
                       class_mask)


@functools.partial(jax.jit, static_argnums=(0,))
def detect_step_tta(cfg: ModelCfg, variables, images_u8, w,
                    scale_factor, pad_param, ori_shape,
                    class_mask=None) -> Detections:
    """Flip test-time augmentation in one jitted step.

    Reference: test.py:95-128 --tta with the default DetTTAModel
    (horizontal RandomFlip view added after LetterResize; per-view
    predictions merged by one class-aware NMS at iou 0.5, top 100).

    TPU re-design: the flipped view is stacked onto the batch axis so
    both views share ONE 2B-batch forward (better MXU utilization
    than two launches), then the flipped half's boxes are mirrored
    back in original-image coordinates and the union goes through a
    final labeled NMS. The flipped view's letterbox pad is mirrored
    too (left/right swap) so un-padding is exact — the reference
    reuses the unflipped pad_param, a <=1 px quirk of its center-pad
    split that we do not replicate.
    """
    b = images_u8.shape[0]
    flipped = images_u8[:, :, ::-1, :]
    pad_f = pad_param[:, jnp.asarray([0, 1, 3, 2])]
    det = detect_step(
        cfg, variables,
        jnp.concatenate([images_u8, flipped], 0), w,
        jnp.concatenate([scale_factor, scale_factor], 0),
        jnp.concatenate([pad_param, pad_f], 0),
        jnp.concatenate([ori_shape, ori_shape], 0), class_mask)

    fb = det.boxes[b:]
    wmax = ori_shape[:, 1][:, None]
    fb = jnp.stack([wmax - fb[..., 2], fb[..., 1],
                    wmax - fb[..., 0], fb[..., 3]], axis=-1)
    boxes = jnp.concatenate([det.boxes[:b], fb], 1)
    scores = jnp.concatenate([det.scores[:b], det.scores[b:]], 1)
    labels = jnp.concatenate([det.labels[:b], det.labels[b:]], 1)
    valid = jnp.concatenate([det.valid[:b], det.valid[b:]], 1)
    embeds = jnp.concatenate([det.embeds[:b], det.embeds[b:]], 1)

    t = cfg.test
    res = nms_labeled(boxes, scores, labels, valid,
                      t.tta_nms_iou_thr, t.tta_max_per_img)
    kept_embeds = jnp.take_along_axis(
        embeds, jnp.clip(res.anchors, 0)[..., None], axis=1)
    return Detections(boxes=res.boxes, scores=res.scores,
                      labels=res.labels, embeds=kept_embeds,
                      anchors=res.anchors, valid=res.valid)


@functools.partial(jax.jit, static_argnums=(0,))
def forward_raw(cfg: ModelCfg, variables, images_u8, w=None
                ) -> DetectorOutputs:
    """Decoded per-anchor outputs without NMS (for eval/proposals)."""
    images = images_u8.astype(jnp.float32) / 255.0
    out = WeDetectModule(cfg).apply(variables, images, w)
    return decode_outputs(cfg, out, images_u8.shape[1:3])


def per_anchor_scale_bias(cfg: ModelCfg, variables,
                          img_size: Optional[Tuple[int, int]] = None):
    """Per-anchor (A,) logit_scale / bias vectors from the per-level
    contrastive heads — stored with Uni proposals for retrieval
    (reference: eval_recall/eval_recall.py:1334-1343 gathers these).
    """
    head = variables["params"]["head"]
    sizes = cfg.feat_sizes(img_size)
    scales, biases = [], []
    for i, (h, w) in enumerate(sizes):
        n = h * w
        c = head[f"contrast{i}"]
        scales.append(np.full((n,), float(c["logit_scale"]), np.float32))
        biases.append(np.full((n,), float(c["bias"]), np.float32))
    return np.concatenate(scales), np.concatenate(biases)


def init_variables(cfg: ModelCfg, seed: int = 0):
    """Random-init variables (params + batch_stats)."""
    module = WeDetectModule(cfg)
    h, w = cfg.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    if cfg.num_prompts:
        return module.init(jax.random.PRNGKey(seed), dummy)
    wtxt = jnp.zeros((cfg.num_classes, cfg.embed_dims), jnp.float32)
    return module.init(jax.random.PRNGKey(seed), dummy, wtxt)
