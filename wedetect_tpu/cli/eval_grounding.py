"""Distributed REC/grounding benchmark evaluation CLI.

Usage (mirrors reference wedetect_ref/eval_grounding/eval.py):
    python -m wedetect_tpu.cli.eval_grounding \
        --ref_checkpoint <hf-dir> --dataset refcoco \
        --ann val.json testA.json --img-root imgs \
        --proposals proposals.json --num_select 20

Dataset formats (reference ds_collections):
- refcoco-style: JSON list of {id, image, conversations
  [{value: query}, {value: label}], bounding_boxes}
- proposals: {image_name: [boxes] | [[boxes],[scores]]}
Metrics: top-1/5/10 accuracy at IoU 0.5 per annotation file
(eval.py:1102-1341), computed with
wedetect_tpu.eval.rec.rec_topk_accuracy.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="WeDetect-Ref REC eval")
    p.add_argument("--ref_checkpoint", required=True)
    p.add_argument("--dataset", default="refcoco")
    p.add_argument("--ann", nargs="+", required=True)
    p.add_argument("--img-root", required=True)
    p.add_argument("--proposals", required=True)
    p.add_argument("--num_select", type=int, default=20)
    p.add_argument("--num_proposals", type=int, default=100)
    p.add_argument("--max-items", type=int, default=0)
    p.add_argument("--batch-queries", type=int, default=8)
    p.add_argument("--out", default="")
    return p.parse_args(argv)


def load_scorer(ckpt_dir: str, batch_queries: int):
    import glob

    import numpy as np
    import transformers

    from wedetect_tpu.ckpt.convert_ref import convert_ref_model
    from wedetect_tpu.models.ref_api import RefScorer
    from wedetect_tpu.nn.qwen3vl import RefCfg

    hf_cfg = transformers.AutoConfig.from_pretrained(ckpt_dir)
    cfg = RefCfg.from_hf_config(hf_cfg)
    tok = transformers.AutoTokenizer.from_pretrained(ckpt_dir)
    obj_id = tok.convert_tokens_to_ids("<object>")
    import dataclasses

    cfg = dataclasses.replace(cfg, object_token_id=obj_id)
    sd = {}
    from safetensors import safe_open  # type: ignore

    for f in sorted(glob.glob(os.path.join(ckpt_dir,
                                           "*.safetensors"))):
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                sd[k] = sf.get_tensor(k)
    params = convert_ref_model(sd, cfg)
    return RefScorer(cfg=cfg, params=params, tokenizer=tok,
                     query_batch=batch_queries)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np

    from wedetect_tpu.data.loader import load_image_rgb
    from wedetect_tpu.eval.dist import all_gather_object
    from wedetect_tpu.eval.rec import rec_topk_accuracy, score_and_rank
    from wedetect_tpu.eval.runner import process_shard

    proposals_map = json.load(open(args.proposals))
    scorer = load_scorer(args.ref_checkpoint, args.batch_queries)

    results = {}
    for ann_path in args.ann:
        subset = os.path.basename(ann_path).split(".")[0]
        data = json.load(open(ann_path))
        idxs = list(process_shard(len(data)))
        if args.max_items:
            idxs = idxs[:args.max_items]
        pred_boxes, gt_boxes = [], []
        for i in idxs:
            ann = data[i]
            props = proposals_map[ann["image"]]
            if len(props) == 2 and isinstance(props[0][0], list):
                props = props[0]
            props = np.asarray(props,
                               np.float32)[:args.num_proposals]
            img = load_image_rgb(
                os.path.join(args.img_root, ann["image"]))
            query = ann["conversations"][1]["value"]
            scores = scorer.score(img, props, [query])[0]
            pred_boxes.append(
                score_and_rank(props[:len(scores)], scores,
                               args.num_select))
            gt_boxes.append(np.asarray(ann["bounding_boxes"],
                                       np.float32))
        merged = all_gather_object((pred_boxes, gt_boxes))
        pred_boxes = [b for part in merged for b in part[0]]
        gt_boxes = [b for part in merged for b in part[1]]
        results[subset] = rec_topk_accuracy(pred_boxes, gt_boxes)
        print(subset, results[subset], flush=True)
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
