"""Independent COCOeval-bbox oracle for differential testing.

A deliberately naive, loop-based transcription of the PUBLISHED
pycocotools COCOeval bbox algorithm (cocoapi PythonAPI/pycocotools/
cocoeval.py semantics: per-(image,category) greedy matching in
``evaluateImg`` + 101-point interpolated precision in ``accumulate`` /
``summarize``). pycocotools itself is not installable in this image,
so this transcription is the canonical-semantics stand-in — it shares
NO code with wedetect_tpu.eval.coco_map (its own IoU, its own sorting,
its own accumulation, plain Python loops) so that a bug would have to
be made twice, independently, to go unseen.

Used only by tests/test_coco_differential.py (VERDICT r3 item 2: the
entire mAP north-star funnels through the hand-rolled evaluator; pin
it against an independent implementation on randomized scenes).
"""

import numpy as np

# the exact Params() formulas from pycocotools cocoeval.py — the ulp
# matters: 0.5 + 0.05*7 is one ulp ABOVE linspace's 0.85, and integer
# boxes produce IoUs of exactly 0.85, flipping matches at t=7 (found
# by this very differential test, seed 15)
IOU_THRS = list(np.linspace(
    0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1, endpoint=True))
REC_THRS = list(np.linspace(
    0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1, endpoint=True))
AREA_RNGS = [
    ("all", 0.0, 1e10),
    ("small", 0.0, 32.0 ** 2),
    ("medium", 32.0 ** 2, 96.0 ** 2),
    ("large", 96.0 ** 2, 1e10),
]


def _iou_single(d, g, crowd):
    """IoU of two xyxy boxes; crowd gt -> intersection / det area."""
    ix = min(d[2], g[2]) - max(d[0], g[0])
    iy = min(d[3], g[3]) - max(d[1], g[1])
    if ix <= 0 or iy <= 0:
        return 0.0
    inter = ix * iy
    da = max(d[2] - d[0], 0.0) * max(d[3] - d[1], 0.0)
    ga = max(g[2] - g[0], 0.0) * max(g[3] - g[1], 0.0)
    denom = da if crowd else (da + ga - inter)
    return inter / denom if denom > 0 else 0.0


class CocoOracle:
    """add_image() per image, then evaluate() -> metric dict with the
    same keys as wedetect_tpu.eval.coco_map.CocoEvaluator.summarize."""

    def __init__(self, max_dets=100):
        self.max_dets = max_dets
        self.images = []

    def add_image(self, gt_boxes, gt_labels, gt_crowd, gt_areas,
                  dt_boxes, dt_scores, dt_labels):
        self.images.append((
            [list(map(float, b)) for b in gt_boxes],
            [int(x) for x in gt_labels],
            [bool(x) for x in gt_crowd],
            [float(x) for x in gt_areas],
            [list(map(float, b)) for b in dt_boxes],
            [float(x) for x in dt_scores],
            [int(x) for x in dt_labels],
        ))

    def _eval_img(self, img, cat, amin, amax):
        """Transcription of COCOeval.evaluateImg for one (image, cat,
        areaRng): returns (dt_scores, dt_matched, dt_ignored, n_gt_keep)
        with dt arrays shaped [T][nd], or None when the image has no
        gt and no dt of this category."""
        gb, gl, gc, ga, db, ds, dl = img
        gidx = [i for i in range(len(gl)) if gl[i] == cat]
        didx = [i for i in range(len(dl)) if dl[i] == cat]
        if not gidx and not didx:
            return None
        # gt ignore flag for this range; stable sort ignored-last
        gig0 = [gc[i] or ga[i] < amin or ga[i] > amax for i in gidx]
        gorder = sorted(range(len(gidx)), key=lambda i: gig0[i])
        gts = [gidx[i] for i in gorder]
        gig = [gig0[i] for i in gorder]
        # dt sorted by descending score (stable), capped at maxDet
        dorder = sorted(range(len(didx)), key=lambda i: -ds[didx[i]])
        dts = [didx[i] for i in dorder][:self.max_dets]

        T = len(IOU_THRS)
        gtm = [[-1] * len(gts) for _ in range(T)]
        dtm = [[-1] * len(dts) for _ in range(T)]
        dtig = [[False] * len(dts) for _ in range(T)]
        for ti, thr in enumerate(IOU_THRS):
            for di, d in enumerate(dts):
                best = min(thr, 1 - 1e-10)
                m = -1
                for gi, g in enumerate(gts):
                    if gtm[ti][gi] >= 0 and not gc[g]:
                        continue
                    if m > -1 and not gig[m] and gig[gi]:
                        break
                    iou = _iou_single(db[d], gb[g], gc[g])
                    if iou < best:
                        continue
                    best = iou
                    m = gi
                if m == -1:
                    continue
                dtm[ti][di] = m
                gtm[ti][m] = di
                dtig[ti][di] = gig[m]
        for ti in range(T):
            for di, d in enumerate(dts):
                if dtm[ti][di] == -1:
                    darea = max(db[d][2] - db[d][0], 0.0) \
                        * max(db[d][3] - db[d][1], 0.0)
                    dtig[ti][di] = darea < amin or darea > amax
        scores = [ds[d] for d in dts]
        matched = [[dtm[ti][di] >= 0 for di in range(len(dts))]
                   for ti in range(T)]
        return scores, matched, dtig, sum(1 for x in gig if not x)

    def evaluate(self):
        cats = sorted({c for img in self.images
                       for c in list(img[1]) + list(img[6])})
        T, R = len(IOU_THRS), len(REC_THRS)
        # precision[area][ti][ri][ci], -1 = undefined
        precision = {a[0]: [[[-1.0] * len(cats) for _ in range(R)]
                            for _ in range(T)] for a in AREA_RNGS}
        for ci, cat in enumerate(cats):
            for aname, amin, amax in AREA_RNGS:
                per_img = [self._eval_img(img, cat, amin, amax)
                           for img in self.images]
                per_img = [e for e in per_img if e is not None]
                npig = sum(e[3] for e in per_img)
                if npig == 0:
                    continue
                # global sort of all detections by descending score
                # (stable, image order preserved on ties)
                flat = []
                for e in per_img:
                    scores, matched, dtig, _ = e
                    for di in range(len(scores)):
                        flat.append((scores[di],
                                     [matched[ti][di] for ti in range(T)],
                                     [dtig[ti][di] for ti in range(T)]))
                order = sorted(range(len(flat)),
                               key=lambda i: -flat[i][0])
                for ti in range(T):
                    tp, fp = 0, 0
                    rc, pr = [], []
                    for i in order:
                        _, m, ig = flat[i]
                        if ig[ti]:
                            # ignored: no increment (pycocotools keeps
                            # the row with neither tp nor fp — the
                            # plateau is equivalent to dropping it)
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
                        # searchsorted(rc, rthr, side='left')
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
            return mean_valid([p[t][r][c] for t in tis for r in range(R)
                               for c in range(len(cats))])

        out = {
            "mAP": ap("all"),
            "AP50": ap("all", 0),
            "AP75": ap("all", 5),
            "APs": ap("small"),
            "APm": ap("medium"),
            "APl": ap("large"),
        }
        out["per_class"] = {
            int(cat): mean_valid([precision["all"][t][r][ci]
                                  for t in range(T) for r in range(R)])
            for ci, cat in enumerate(cats)}
        return out
