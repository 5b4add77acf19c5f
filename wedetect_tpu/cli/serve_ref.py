"""Batch generation serving CLI: continuous batching over a request
file.

The reference has no serving entry point at all (its stage-1/2 twin
inherits HF ``.generate()``, one static batch to completion —
wedetect_ref/models/qwen3vl_grounding.py:311-379). This CLI drives the
TPU-native production path: RefScorer.generate_batch ->
models/serve.GenServer (slot pool over one shared donated KV cache,
mid-run admission, pipelined chunked decode).

Usage:
    python -m wedetect_tpu.cli.serve_ref \
        --ref_checkpoint <hf-dir> --requests reqs.jsonl \
        [--slots 8 --chunk 16 --max_new_tokens 64 --int8-decode]

reqs.jsonl: one JSON object per line, {"image": <path/URL/data-URI>,
"prompt": "..."} — image sources as in data/vision_process.fetch_image.
Output: one JSON line per request {"id", "image", "text"} in input
order, plus a throughput summary on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="WeDetect-Ref continuous-batching generation")
    p.add_argument("--ref_checkpoint", required=True)
    p.add_argument("--requests", required=True,
                   help="JSONL: {'image': path/URL, 'prompt': str}")
    p.add_argument("--out", default="", help="write JSONL here "
                   "instead of stdout")
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--f32", dest="bf16", action="store_false")
    p.add_argument("--int8-decode", action="store_true",
                   help="weight-only int8 decode (models/quant)")
    p.add_argument("--int4-decode", action="store_true",
                   help="weight-only packed-int4 decode (models/"
                        "quant; lossier — validate per checkpoint)")
    p.add_argument("--int8-kv", action="store_true",
                   help="int8 KV cache pool (models/serve kv_bits=8):"
                        " ~0.52x KV HBM + decode read traffic; lossy "
                        "like weight-only int8 — gate per deployment")
    p.add_argument("--piggyback", action="store_true",
                   help="ride admission prefills on the decode chunks"
                        " (models/serve chunked prefill)")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="sampling temperature (0 = greedy); streams "
                        "are per-request reproducible via --seed + "
                        "request index, independent of scheduling")
    p.add_argument("--top_k", type=int, default=0,
                   help="keep only the k highest logits (0 = off)")
    p.add_argument("--top_p", type=float, default=1.0,
                   help="nucleus sampling mass (1.0 = off)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from wedetect_tpu.cli._ref_load import load_ref
    from wedetect_tpu.data.vision_process import fetch_image
    from wedetect_tpu.models.ref_api import RefScorer

    cfg, params, tok = load_ref(args.ref_checkpoint)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=tok,
                       dtype="bfloat16" if args.bf16 else "float32",
                       quantize_decode="int4" if args.int4_decode
                       else args.int8_decode)
    reqs = []
    with open(args.requests) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            reqs.append((r["image"], r["prompt"]))
    images = [fetch_image(src) for src, _ in reqs]
    eos = (tok.convert_tokens_to_ids("<|im_end|>")
           if hasattr(tok, "convert_tokens_to_ids") else 151645)

    t0 = time.perf_counter()
    texts = scorer.generate_batch(
        [(img, prompt) for img, (_, prompt) in zip(images, reqs)],
        max_new_tokens=args.max_new_tokens, eos_token_id=eos,
        slots=args.slots, chunk=args.chunk, piggyback=args.piggyback,
        temperature=args.temperature, top_k=args.top_k,
        top_p=args.top_p, seed=args.seed,
        kv_bits=8 if args.int8_kv else 16)
    dt = time.perf_counter() - t0

    sink = open(args.out, "w") if args.out else sys.stdout
    for i, ((src, _), text) in enumerate(zip(reqs, texts)):
        sink.write(json.dumps({"id": i, "image": src, "text": text},
                              ensure_ascii=False) + "\n")
    if args.out:
        sink.close()
    print(f"{len(reqs)} requests in {dt:.2f}s "
          f"({len(reqs) / dt:.2f} req/s, slots={args.slots}, "
          f"chunk={args.chunk})", file=sys.stderr)


if __name__ == "__main__":
    main()
