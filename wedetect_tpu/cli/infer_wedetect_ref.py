"""WeDetect-Ref REC demo: Uni proposals + one query -> best box.

Usage (mirrors reference infer_wedetect_ref.py:13-135):
    python -m wedetect_tpu.cli.infer_wedetect_ref \
        --ref_checkpoint <hf-dir-or-pth> --wedetect_uni_checkpoint u.pth \
        --image demo.jpg --query "the red box" --visualize
With --random-init a tiny random model runs end-to-end (smoke mode).
"""

from __future__ import annotations

import argparse


def _run_generate(args, img):
    """Caption/chat mode: the TPU twin of the reference stage-1/2
    class's inherited HF .generate() (qwen3vl_grounding.py:311-379)."""
    from wedetect_tpu.cli._ref_load import load_ref
    from wedetect_tpu.models.ref_api import RefScorer

    cfg, params, tok = load_ref(args.ref_checkpoint)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=tok,
                       quantize_decode="int4" if args.int4_decode
                       else args.int8_decode,
                       quant_prefill=args.int8_prefill)
    text = scorer.generate_text(
        img, args.generate, max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        eos_token_id=tok.convert_tokens_to_ids("<|im_end|>"),
        speculative=args.speculative)
    print(text)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="WeDetect-Ref REC demo")
    p.add_argument("--ref_checkpoint", default="")
    p.add_argument("--wedetect_uni_checkpoint", default="")
    p.add_argument("--image", default="")
    p.add_argument("--video", default="",
                   help="video source (file/dir/glob/GIF/.npy — "
                        "data/vision_process.fetch_video) for "
                        "--generate video chat; grounding/scoring "
                        "stays image-only, as in the reference")
    p.add_argument("--fps", type=float, default=None,
                   help="target sampling fps for --video "
                        "(smart_nframes; default 2.0)")
    p.add_argument("--nframes", type=int, default=None,
                   help="exact frame count for --video (rounded to "
                        "the frame factor)")
    p.add_argument("--query", default="")
    p.add_argument("--score_thre", type=float, default=-1.0,
                   help="<0: top-1 box; >=0: threshold")
    p.add_argument("--num_proposals", type=int, default=100)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--output", default="pred_ref.png")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--generate", default="",
                   help="chat/caption prompt: run text GENERATION "
                        "instead of proposal scoring (stage-1/2 twin "
                        "checkpoints; models/ref_generate)")
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--int8-prefill", action="store_true",
                   help="dynamic-int8 decoder/ViT prefill matmuls "
                        "(ops/int8.py; compute-bound scoring at 2x "
                        "MXU peak)")
    p.add_argument("--int8-decode", action="store_true",
                   help="weight-only int8 generation decode "
                        "(models/quant)")
    p.add_argument("--int4-decode", action="store_true",
                   help="weight-only packed-int4 generation decode "
                        "(models/quant; lossier — validate per "
                        "checkpoint)")
    p.add_argument("--speculative", action="store_true",
                   help="prompt-lookup speculative decoding (greedy "
                        "only; models/ref_speculative)")
    return p.parse_args(argv)


def _run_generate_video(args):
    """Video chat: fetch_video frames -> one contiguous video span
    through the grounding trunk (RefScorer.generate_video_text)."""
    from wedetect_tpu.cli._ref_load import load_ref
    from wedetect_tpu.models.ref_api import RefScorer

    cfg, params, tok = load_ref(args.ref_checkpoint)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=tok,
                       quantize_decode="int4" if args.int4_decode
                       else args.int8_decode,
                       quant_prefill=args.int8_prefill)
    text = scorer.generate_video_text(
        args.video, args.generate, max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        eos_token_id=tok.convert_tokens_to_ids("<|im_end|>"),
        fps=args.fps, nframes=args.nframes)
    print(text)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np

    from wedetect_tpu.data.loader import load_image_rgb
    from wedetect_tpu.models.api import Detector
    from wedetect_tpu.models.ref_api import RefScorer

    if args.video:
        if not args.generate:
            raise SystemExit("--video requires --generate (video "
                             "chat); grounding is image-only")
        _run_generate_video(args)
        return
    if not args.image:
        raise SystemExit("supply --image (or --video with --generate)")
    img = load_image_rgb(args.image)

    if args.generate:
        _run_generate(args, img)
        return
    if not args.query:
        raise SystemExit("--query is required for proposal scoring")

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
    if args.random_init:
        raise SystemExit(
            "random-init Ref requires the full Qwen3-VL config; supply "
            "--ref_checkpoint (HF dir with config.json + weights)")
    from wedetect_tpu.cli._ref_load import load_ref

    cfg, params, tok = load_ref(args.ref_checkpoint)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=tok,
                       quant_prefill=args.int8_prefill)
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
