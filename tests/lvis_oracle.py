"""Independent LVIS fixed-AP oracle for differential testing.

A naive, loop-based transcription of the PUBLISHED LVIS evaluation
protocol (lvis-api LVISEval semantics plus the Dave et al. fixed-AP
per-class cap) layered over the tests/coco_oracle.py COCO matcher —
the oracle side shares NO code with wedetect_tpu.eval.lvis_map, so a
protocol bug would have to be made twice, independently, to go
unseen. LVIS-specific semantics transcribed here:

- per-image category domain: category c is evaluated on image i only
  when c has gt on i or c is in i's neg_category_ids; detections of
  out-of-domain categories are removed up front (the protocol never
  evaluates that (image, category) pair).
- not_exhaustive_category_ids: unmatched detections of those
  categories on that image are ignored, not false positives
  (per IoU threshold, after matching — lvis-api dtIg extension).
- fixed AP: the result file is capped to the top `per_class_cap`
  detections per category across the dataset BEFORE evaluation
  (exactly k on score ties, stable in file order: image order, then
  submission order within the image). A capped-out detection never
  participates in matching.
- APr/APc/APf: per-class 'all'-range AP averaged within frequency
  groups, NaN (no-gt) classes excluded.

Used only by tests/test_lvis_differential.py (VERDICT r4 next #4).
"""

import numpy as np

from coco_oracle import CocoOracle, IOU_THRS


class LvisOracle(CocoOracle):
    def __init__(self, per_class_cap=10000, frequencies=None):
        # no per-image maxDets in fixed AP — effectively unbounded
        super().__init__(max_dets=10 ** 9)
        self.cap = per_class_cap
        self.freq = frequencies or {}
        self.negs = []
        self.nexh = []

    def add_image(self, gt_boxes, gt_labels, gt_areas,
                  dt_boxes, dt_scores, dt_labels,
                  neg_cats=(), not_exhaustive=()):
        n = len(gt_labels)
        super().add_image(gt_boxes, gt_labels, [False] * n, gt_areas,
                          dt_boxes, dt_scores, dt_labels)
        self.negs.append({int(c) for c in neg_cats})
        self.nexh.append({int(c) for c in not_exhaustive})

    def evaluate(self):
        # ---- 1. domain filter, per image
        imgs = []
        for k, (gb, gl, gc, ga, db, ds, dl) in enumerate(self.images):
            domain = set(gl) | self.negs[k]
            keep = [j for j in range(len(dl)) if dl[j] in domain]
            imgs.append((gb, gl, gc, ga,
                         [db[j] for j in keep],
                         [ds[j] for j in keep],
                         [dl[j] for j in keep]))

        # ---- 2. fixed-AP cap: global top-k per class by score,
        # stable over (image order, submission order)
        per_cls = {}
        for k, img in enumerate(imgs):
            for j, c in enumerate(img[6]):
                per_cls.setdefault(c, []).append((img[5][j], k, j))
        drop = set()
        for c, lst in per_cls.items():
            if len(lst) <= self.cap:
                continue
            order = sorted(range(len(lst)), key=lambda i: -lst[i][0])
            for i in order[self.cap:]:
                drop.add((c, lst[i][1], lst[i][2]))
        if drop:
            imgs = [
                (gb, gl, gc, ga,
                 [db[j] for j in range(len(dl))
                  if (dl[j], k, j) not in drop],
                 [ds[j] for j in range(len(dl))
                  if (dl[j], k, j) not in drop],
                 [dl[j] for j in range(len(dl))
                  if (dl[j], k, j) not in drop])
                for k, (gb, gl, gc, ga, db, ds, dl)
                in enumerate(imgs)]

        # ---- 3. standard COCO matching per (image, cat, area), with
        # the not-exhaustive dtIg extension, then 101-pt accumulation
        # (transcribed from coco_oracle.evaluate with the LVIS hook)
        from coco_oracle import AREA_RNGS, REC_THRS

        cats = sorted({c for img in imgs
                       for c in list(img[1]) + list(img[6])})
        T, R = len(IOU_THRS), len(REC_THRS)
        precision = {a[0]: [[[-1.0] * len(cats) for _ in range(R)]
                            for _ in range(T)] for a in AREA_RNGS}
        for ci, cat in enumerate(cats):
            for aname, amin, amax in AREA_RNGS:
                flat, npig = [], 0
                for k, img in enumerate(imgs):
                    e = self._eval_img(img, cat, amin, amax)
                    if e is None:
                        continue
                    scores, matched, dtig, n_gt = e
                    if cat in self.nexh[k]:
                        # unmatched dets of a not-exhaustively
                        # annotated category: ignored, not FP
                        dtig = [[dtig[ti][di] or not matched[ti][di]
                                 for di in range(len(scores))]
                                for ti in range(T)]
                    npig += n_gt
                    for di in range(len(scores)):
                        flat.append((scores[di],
                                     [matched[ti][di]
                                      for ti in range(T)],
                                     [dtig[ti][di]
                                      for ti in range(T)]))
                if npig == 0:
                    continue
                order = sorted(range(len(flat)),
                               key=lambda i: -flat[i][0])
                for ti in range(T):
                    tp, fp = 0, 0
                    rc, pr = [], []
                    for i in order:
                        _, m, ig = flat[i]
                        if ig[ti]:
                            continue
                        if m[ti]:
                            tp += 1
                        else:
                            fp += 1
                        rc.append(tp / npig)
                        pr.append(tp / (tp + fp + np.spacing(1)))
                    for i in range(len(pr) - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    for ri, rthr in enumerate(REC_THRS):
                        pi = len(rc)
                        for i, v in enumerate(rc):
                            if v >= rthr:
                                pi = i
                                break
                        precision[aname][ti][ri][ci] = (
                            pr[pi] if pi < len(pr) else 0.0)

        def mean_valid(vals):
            vals = [v for v in vals if v > -1]
            return float(np.mean(vals)) if vals else float("nan")

        def ap(aname, ti=None):
            p = precision[aname]
            tis = range(T) if ti is None else [ti]
            return mean_valid([p[t][r][c] for t in tis
                               for r in range(R)
                               for c in range(len(cats))])

        out = {
            "mAP": ap("all"),
            "AP50": ap("all", 0),
            "AP75": ap("all", 5),
            "APs": ap("small"),
            "APm": ap("medium"),
            "APl": ap("large"),
        }
        per_class = {
            int(cat): mean_valid([precision["all"][t][r][ci]
                                  for t in range(T)
                                  for r in range(R)])
            for ci, cat in enumerate(cats)}
        out["per_class"] = per_class
        for tag, name in (("r", "APr"), ("c", "APc"), ("f", "APf")):
            vals = [v for c, v in per_class.items()
                    if self.freq.get(c) == tag and not np.isnan(v)]
            out[name] = float(np.mean(vals)) if vals else float("nan")
        return out
