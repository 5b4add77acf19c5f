"""WeDetect-Ref stage-3 SFT: focal loss on proposal scores.

Behavioral spec: reference wedetect_ref/sft_referring.py:
- soft labels (:262-278): proposals IoU-matched to gt; gt boxes with
  no proposal above 0.5 are appended as extra proposals; the combined
  set is shuffled; label = max-IoU vs gts where > 0.5 else 0
- loss: sigmoid focal over <object> logits
  (qwen3vl_referring.py:426-445)
- 3-tier learning rates (:107-198 CustomTrainer.create_optimizer):
  visual tower x0.1, body x1, out_proj x10
- launch: lr 1e-5, vision frozen (scripts/run_stage3.sh), ZeRO -> here
  fsdp-sharded params/optimizer over the mesh

TPU design: one jitted step over (B=queries, L) with a shared image per
step (per-image gradient accumulation happens across steps); shapes
static via the same bucketing as inference.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wedetect_tpu.models.ref import RefModules, sigmoid_focal_loss
from wedetect_tpu.nn.qwen3vl import RefCfg
from wedetect_tpu.train.optimizer import make_optimizer
from wedetect_tpu.train.train_step import TrainState


def build_soft_labels(gt_boxes: np.ndarray, proposals: np.ndarray,
                      rng: np.random.Generator,
                      iou_thr: float = 0.5
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(proposals', labels): unmatched gts appended, set shuffled,
    label = max IoU vs gts where > iou_thr else 0."""
    from wedetect_tpu.eval.coco_map import box_iou_xyxy

    proposals = np.asarray(proposals, np.float32).reshape(-1, 4)
    gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
    if len(gt_boxes) == 0:
        return proposals, np.zeros(len(proposals), np.float32)
    ious = box_iou_xyxy(gt_boxes, proposals)
    best_per_gt = ious.max(axis=1) if len(proposals) else \
        np.zeros(len(gt_boxes))
    proposals = np.concatenate(
        [proposals, gt_boxes[best_per_gt < iou_thr]], axis=0)
    proposals = proposals[rng.permutation(len(proposals))]
    ious = box_iou_xyxy(gt_boxes, proposals).max(axis=0)
    labels = np.where(ious > iou_thr, ious, 0.0).astype(np.float32)
    return proposals, labels


def ref_optimizer(params, base_lr: float = 1e-5,
                  weight_decay: float = 0.0,
                  freeze_vision: bool = True, lr_schedule=None
                  ) -> optax.GradientTransformation:
    """3-tier LRs; optionally zero out the vision tower entirely
    (stage-3 freezes it — run_stage3.sh)."""
    mults = {"vision": 0.0 if freeze_vision else 0.1,
             "out_proj": 10.0}
    return make_optimizer(params, base_lr=base_lr,
                          weight_decay=weight_decay,
                          lr_schedule=lr_schedule,
                          custom_lr_mults=mults)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 8),
                   donate_argnums=(3,))
def ref_sft_step(cfg: RefCfg, grid_h: int, grid_w: int,
                 state: TrainState, patches, input_ids, attn_mask,
                 position_ids, visual_start: int, boxes, ori_wh,
                 object_positions, labels, valid=None
                 ) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """labels: (B, N) soft IoU targets for the object slots.
    valid: optional (B, N) 0/1 — masks proposal-axis padding so
    padded slots contribute no loss (the reference has dynamic N)."""

    def loss_fn(params):
        logits = RefModules(cfg, grid_h, grid_w).apply(
            {"params": params}, patches, input_ids, attn_mask,
            position_ids, boxes, ori_wh, visual_start,
            object_positions)
        return sigmoid_focal_loss(logits.reshape(-1),
                                  labels.reshape(-1),
                                  valid=None if valid is None
                                  else valid.reshape(-1))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state,
                                       state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt), {
        "loss": loss, "grad_norm": optax.global_norm(grads),
        "num_pos": (labels > 0).sum()}
