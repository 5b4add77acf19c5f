"""WeDetect-Ref REC demo: Uni proposals + one query -> best box.

Usage (mirrors reference infer_wedetect_ref.py:13-135):
    python -m wedetect_tpu.cli.infer_wedetect_ref \
        --ref_checkpoint <hf-dir-or-pth> --wedetect_uni_checkpoint u.pth \
        --image demo.jpg --query "the red box" --visualize
With --random-init a tiny random model runs end-to-end (smoke mode).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="WeDetect-Ref REC demo")
    p.add_argument("--ref_checkpoint", default="")
    p.add_argument("--wedetect_uni_checkpoint", default="")
    p.add_argument("--image", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--score_thre", type=float, default=-1.0,
                   help="<0: top-1 box; >=0: threshold")
    p.add_argument("--num_proposals", type=int, default=100)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--output", default="pred_ref.png")
    p.add_argument("--random-init", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np

    from wedetect_tpu.data.loader import load_image_rgb
    from wedetect_tpu.models.api import Detector
    from wedetect_tpu.models.ref_api import RefScorer
    from wedetect_tpu.nn.qwen3vl import RefCfg

    img = load_image_rgb(args.image)

    # stage 1: Uni proposals
    if args.random_init or not args.wedetect_uni_checkpoint:
        uni = Detector.from_random("uni_base")
    else:
        uni = Detector.from_torch_checkpoint(
            args.wedetect_uni_checkpoint, "base", uni=True)
    props = uni([img], score_thr=0.0)[0]
    boxes = props["bboxes"][:args.num_proposals]
    print(f"{len(boxes)} proposals from WeDetect-Uni")

    # stage 2: Ref scoring
    if args.random_init or not args.ref_checkpoint:
        raise SystemExit(
            "random-init Ref requires the full Qwen3-VL config; supply "
            "--ref_checkpoint (HF dir with config.json + weights)")
    import transformers

    from wedetect_tpu.ckpt.convert_ref import convert_ref_model

    hf_cfg = transformers.AutoConfig.from_pretrained(args.ref_checkpoint)
    cfg = RefCfg.from_hf_config(hf_cfg)
    tok = transformers.AutoTokenizer.from_pretrained(args.ref_checkpoint)
    obj_id = tok.convert_tokens_to_ids("<object>")
    cfg = type(cfg)(**{**cfg.__dict__, "object_token_id": obj_id})
    import torch

    sd = {}
    from safetensors import safe_open  # type: ignore
    import glob
    import os

    for f in sorted(glob.glob(os.path.join(args.ref_checkpoint,
                                           "*.safetensors"))):
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                sd[k] = sf.get_tensor(k)
    params = convert_ref_model(sd, cfg)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=tok)
    scores = scorer.score(img, boxes, [args.query])[0]

    if args.score_thre < 0:
        keep = np.argsort(-scores)[:1]
    else:
        keep = np.nonzero(scores > args.score_thre)[0]
    for i in keep:
        b = boxes[i]
        print(f"score {scores[i]:.3f} box "
              f"[{b[0]:.0f},{b[1]:.0f},{b[2]:.0f},{b[3]:.0f}]")
    if args.visualize:
        from wedetect_tpu.utils.vis import draw_detections

        out = draw_detections(img, boxes[keep], scores[keep],
                              np.zeros(len(keep), np.int64),
                              class_names=[args.query])
        out.save(args.output)
        print(f"saved {args.output}")


if __name__ == "__main__":
    main()
