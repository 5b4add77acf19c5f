"""Round-4 big-batch serving session (single process, sequential —
one TPU process at a time per NOTES.md).

The r3/r4 serving rows all ran slots=8 — chosen to match the static
b=8 generation row, not because 8 is where the engine peaks. The
decode step is HBM-bound on the 2.38B weight set (PERF.md "Text
generation"), so every extra slot rides the same weight stream
~free until the KV-cache reads and attention FLOPs catch up. This
session measures where the engine actually peaks on one v5e:

1. static marginal decode rate at b in {16, 32, 64} (bf16 + int8
   trees) — the like-for-like roofline for each slot count;
2. GenServer sustained tok/s at slots in {16, 32, 64} (nreq = 4x
   slots, 128 new tokens, P=384 ragged prompts, chunk 8, pipelined);
3. the prefill-share shift: at slots=32+ the workload turns
   admission-bound (each request costs one ~28 ms prefill but its
   decode share shrinks as 1/slots), which is where batch_admit
   (vmapped wave prefills) and piggyback (prompt rows riding decode
   chunks, F=48 vs b=32 rows) were predicted to flip — A/B both.

Writes tools/r4_bigserve.json incrementally; prints to stderr.
Run: python tools/r4_bigserve.py [gen|serve|serve64|ab|int8 ...]
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r4_bigserve.json")


def _save(out):
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# saved {OUT_PATH}", file=sys.stderr)


def main():
    which = set(sys.argv[1:]) or {"gen", "serve", "serve64", "ab"}
    bench._enable_compile_cache()
    out = {}
    if os.path.exists(OUT_PATH):
        out = json.load(open(OUT_PATH))
    t0 = time.time()
    if "gen" in which:
        for b in (16, 32, 64):
            out[f"gen_bf16_b{b}_tok_s"] = round(bench.bench_gen(b=b), 1)
            _save(out)
        gc.collect()
    if "serve" in which:
        for slots in (16, 32):
            out[f"serve_s{slots}"] = bench.bench_serve(
                nreq=4 * slots, slots=slots, chunks=(8,))
            _save(out)
    if "serve64" in which:
        out["serve_s64"] = bench.bench_serve(
            nreq=256, slots=64, chunks=(8, 16))
        _save(out)
    if "ab" in which:
        # admission-policy A/B at slots=32 (admission-bound regime):
        # classic singleton vs vmapped wave prefills vs piggyback
        out["ab_s32_batch_admit"] = bench.bench_serve(
            nreq=128, slots=32, chunks=(8,), batch_admit=True)
        _save(out)
        out["ab_s32_piggyback"] = bench.bench_serve(
            nreq=128, slots=32, chunks=(8,), piggyback=True)
        _save(out)
    if "int8" in which:
        for b in (32, 64):
            out[f"gen_int8_b{b}_tok_s"] = round(
                bench.bench_gen(b=b, int8=True), 1)
            _save(out)
        out["serve_s32_int8"] = bench.bench_serve(
            nreq=128, slots=32, chunks=(8,), int8_prefill=True,
            int8_decode=True)
        _save(out)
        out["serve_s64_int8"] = bench.bench_serve(
            nreq=256, slots=64, chunks=(8,), int8_prefill=True,
            int8_decode=True)
        _save(out)
    print(f"# total {time.time() - t0:.0f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
