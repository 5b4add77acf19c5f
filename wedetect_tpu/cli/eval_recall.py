"""Uni proposal-recall evaluation CLI.

Usage (mirrors reference eval_recall/eval_recall.py):
    python -m wedetect_tpu.cli.eval_recall \
        --checkpoint uni_base.pth --ann instances_val2017.json \
        --img-root val2017 [--max-images N]
Computes Recall@100/300 over IoU .5:.95 with the reference's greedy
matcher. Multi-process sharding + merge is automatic.
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="WeDetect-Uni recall eval")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--size", default="base")
    p.add_argument("--ann", required=True)
    p.add_argument("--img-root", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--num-proposals", type=int, default=300)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--out", default="")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from wedetect_tpu.eval.dist import maybe_initialize

    maybe_initialize()   # join a multihost launch (scripts/dist_test.sh)
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from wedetect_tpu.data.coco import CocoDetDataset
    from wedetect_tpu.data.loader import EvalLoader
    from wedetect_tpu.eval.dist import all_gather_object
    from wedetect_tpu.eval.recall import eval_recalls, summarize_recalls
    from wedetect_tpu.eval.runner import process_shard
    from wedetect_tpu.models.api import Detector
    from wedetect_tpu.models.wedetect import detect_step

    ds = CocoDetDataset(args.ann, args.img_root)
    if args.random_init or not args.checkpoint:
        det = Detector.from_random(f"uni_{args.size}",
                                   compute_dtype="bfloat16")
    else:
        det = Detector.from_torch_checkpoint(
            args.checkpoint, args.size, uni=True,
            compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        det.cfg, test=dataclasses.replace(
            det.cfg.test, score_thr=0.0,
            max_per_img=args.num_proposals))

    indices = list(process_shard(len(ds)))
    if args.max_images:
        indices = indices[:args.max_images]
    loader = EvalLoader(ds, cfg.img_size, batch_size=args.batch_size,
                        indices=indices)
    gts, props = [], []
    for batch in loader:
        out = detect_step(
            cfg, det.variables, jnp.asarray(batch["images"]), None,
            jnp.asarray(batch["scale_factor"]),
            jnp.asarray(batch["pad_param"]),
            jnp.asarray(batch["ori_shape"]))
        boxes = np.asarray(out.boxes)
        scores = np.asarray(out.scores)
        valid = np.asarray(out.valid)
        for i, idx in enumerate(batch["idxs"]):
            v = valid[i]
            gts.append(ds.gt_arrays(idx)["boxes"])
            props.append(np.concatenate(
                [boxes[i][v], scores[i][v][:, None]], -1))
    merged = all_gather_object((gts, props))
    gts = [g for part in merged for g in part[0]]
    props = [p for part in merged for p in part[1]]
    recalls = eval_recalls(gts, props, proposal_nums=(100, 300))
    summary = summarize_recalls(recalls)
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f)


if __name__ == "__main__":
    main()
