"""Evaluation: COCO/LVIS mAP, recall, retrieval, REC, grounding."""

from wedetect_tpu.eval.coco_map import CocoEvaluator
from wedetect_tpu.eval.lvis_map import LvisEvaluator
from wedetect_tpu.eval.recall import eval_recalls, summarize_recalls
from wedetect_tpu.eval.rec import rec_topk_accuracy

__all__ = ["CocoEvaluator", "LvisEvaluator", "eval_recalls",
           "summarize_recalls", "rec_topk_accuracy"]
