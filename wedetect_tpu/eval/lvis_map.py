"""LVIS bbox AP evaluator (fixed-AP protocol).

Behavioral spec: the published LVIS evaluation protocol as used by the
reference's LVISMetric (config/wedetect_base.py:187-195; BASELINE.md
notes "LVIS metrics are fixed AP"):

- per-image CATEGORY DOMAIN: category c is evaluated on image i only
  if c is positively annotated (has gt) or in the image's
  `neg_category_ids` (verified absent). Detections of other
  categories on that image are EXCLUDED (neither TP nor FP).
- categories in `not_exhaustive_category_ids` are present but not
  fully annotated: unmatched detections of those categories are
  ignored rather than counted as false positives.
- fixed AP (Dave et al.): no per-image detection budget; instead a
  per-category cap of 10k detections across the dataset.
- APr/APc/APf: AP averaged over rare (<10 imgs), common (10-100) and
  frequent (>100) categories by training-image frequency.
"""

from __future__ import annotations

import collections
from typing import Dict, List, Optional, Sequence, Set

import numpy as np

from wedetect_tpu.eval.coco_map import (AREA_RNG, IOU_THRS, REC_THRS,
                                        CocoEvaluator)


class LvisEvaluator(CocoEvaluator):
    def __init__(self, class_ids: Sequence[int],
                 per_class_cap: int = 10000,
                 frequencies: Optional[Dict[int, str]] = None):
        super().__init__(class_ids, max_dets=per_class_cap)
        self.per_class_cap = per_class_cap
        # frequencies: {label: 'r'|'c'|'f'}
        self.frequencies = frequencies or {}

    def add_image(self, gt, det_boxes, det_scores, det_labels,
                  neg_cats: Optional[Set[int]] = None,
                  not_exhaustive: Optional[Set[int]] = None) -> None:
        neg_cats = set(neg_cats or ())
        not_exhaustive = set(not_exhaustive or ())
        det_boxes = np.asarray(det_boxes, np.float64)
        det_scores = np.asarray(det_scores, np.float64)
        det_labels = np.asarray(det_labels)
        gt_labels = np.asarray(gt["labels"])
        pos_cats = set(int(c) for c in gt_labels)
        domain = pos_cats | neg_cats

        keep = np.array([int(c) in domain for c in det_labels], bool) \
            if len(det_labels) else np.zeros(0, bool)
        n_before = len(self._records)
        super().add_image(gt, det_boxes[keep], det_scores[keep],
                          det_labels[keep])
        # post-mark not-exhaustive classes: unmatched dets -> ignored
        for idx in range(n_before, len(self._records)):
            cls, rec = self._records[idx]
            if cls in not_exhaustive:
                new_rec = {}
                for aname, (matched, ignored, scores, num_gt) in \
                        rec.items():
                    ignored = ignored | ~matched
                    new_rec[aname] = (matched, ignored, scores, num_gt)
                self._records[idx] = (cls, new_rec)

    def summarize(self) -> Dict[str, float]:
        # per-category dataset-wide cap (fixed AP)
        by_cls_scores: Dict[int, List[np.ndarray]] = \
            collections.defaultdict(list)
        for cls, rec in self._records:
            by_cls_scores[cls].append(rec["all"][2])
        thr_by_cls = {}
        for cls, parts in by_cls_scores.items():
            allsc = np.sort(np.concatenate(parts))[::-1]
            if len(allsc) > self.per_class_cap:
                thr_by_cls[cls] = allsc[self.per_class_cap - 1]
        if thr_by_cls:
            new_records = []
            for cls, rec in self._records:
                thr = thr_by_cls.get(cls)
                if thr is None:
                    new_records.append((cls, rec))
                    continue
                new_rec = {}
                for aname, (matched, ignored, scores, num_gt) in \
                        rec.items():
                    keep = scores >= thr
                    new_rec[aname] = (matched[:, keep],
                                      ignored[:, keep], scores[keep],
                                      num_gt)
                new_records.append((cls, new_rec))
            self._records = new_records

        base = super().summarize()
        if self.frequencies:
            per_class = self._per_class_ap()
            for tag, name in (("r", "APr"), ("c", "APc"),
                              ("f", "APf")):
                vals = [v for c, v in per_class.items()
                        if self.frequencies.get(c) == tag
                        and not np.isnan(v)]
                base[name] = float(np.mean(vals)) if vals else \
                    float("nan")
        return base

    def _per_class_ap(self) -> Dict[int, float]:
        """AP per class over the 'all' area range."""
        by_cls = collections.defaultdict(list)
        for cls, rec in self._records:
            by_cls[cls].append(rec["all"])
        out = {}
        t, r = len(IOU_THRS), len(REC_THRS)
        for cls, recs in by_cls.items():
            num_gt = sum(x[3] for x in recs)
            if num_gt == 0:
                out[cls] = float("nan")
                continue
            matched = np.concatenate([x[0] for x in recs], axis=1)
            ignored = np.concatenate([x[1] for x in recs], axis=1)
            scores = np.concatenate([x[2] for x in recs])
            order = np.argsort(-scores, kind="mergesort")
            matched, ignored = matched[:, order], ignored[:, order]
            aps = []
            for ti in range(t):
                keep = ~ignored[ti]
                tp = np.cumsum(matched[ti][keep])
                fp = np.cumsum(~matched[ti][keep])
                nd = len(tp)
                rc = tp / num_gt if nd else np.zeros(0)
                pr = tp / np.maximum(tp + fp, 1e-12)
                for i in range(nd - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                idx = np.searchsorted(rc, REC_THRS, side="left")
                prec = np.zeros(r)
                ok = idx < nd
                prec[ok] = pr[idx[ok]]
                aps.append(prec.mean())
            out[cls] = float(np.mean(aps))
        return out


def lvis_frequencies_from_ann(coco_json: dict,
                              cat2label) -> Dict[int, str]:
    """{label: 'r'|'c'|'f'} from LVIS categories' `frequency` field."""
    out = {}
    for c in coco_json.get("categories", []):
        f = c.get("frequency")
        if f in ("r", "c", "f") and c["id"] in cat2label:
            out[cat2label[c["id"]]] = f
    return out
