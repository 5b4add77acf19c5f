"""Round-4 on-chip measurement session (single process, sequential —
one TPU process at a time per NOTES.md).

1. b=16 detect attribution (VERDICT r3 item 7): forward_raw (network
   only) vs detect_step (network + NMS/postprocess) at b in
   {4, 8, 12, 16} — splits the 2.03x b=16 step cost into network
   scaling vs postprocess scaling.
2. Serving gap accounting (item 3): bench_serve at chunk 8/16/32 with
   the pipelined run, occupancy, sync-mode baseline and admit/chunk
   device-time microprobes.
3. Static decode marginal rate (context row for #2).
4. Speculative regimes (item 4): favorable (prompt-lookup on cycling
   output) + acceptance-collapse floor (force_reject).

Writes tools/r4_onchip.json and prints progress to stderr.
Run: python tools/r4_onchip.py [b16|serve|gen|spec ...]
"""

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r4_onchip.json")


def _save(out):
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# saved {OUT_PATH}", file=sys.stderr)


def diag_b16():
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.configs import get_config
    from wedetect_tpu.models.wedetect import (detect_step, forward_raw,
                                              init_variables)

    cfg = get_config("base", compute_dtype="bfloat16", num_classes=80)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = init_variables(cfg, seed=0)
        variables = jax.device_put(variables, jax.devices()[0])
    except Exception:
        variables = init_variables(cfg, seed=0)
    h, w = cfg.img_size
    rng = np.random.default_rng(0)
    wtxt = jnp.asarray(rng.standard_normal((80, cfg.embed_dims))
                       .astype(np.float32))
    res = {}
    for b in (4, 8, 12, 16):
        imgs0 = jnp.asarray(rng.integers(0, 255, (b, h, w, 3))
                            .astype(np.uint8))
        sf = jnp.ones((b, 2), jnp.float32)
        pad = jnp.zeros((b, 4), jnp.float32)
        ori = jnp.full((b, 2), float(h), jnp.float32)

        def step_raw(imgs):
            out = forward_raw(cfg, variables, imgs, wtxt)
            tag = (out.scores[0, 0, 0] * 0).astype(jnp.uint8)
            return tag, imgs0 + tag

        def step_full(imgs):
            det = detect_step(cfg, variables, imgs, wtxt, sf, pad, ori)
            tag = (det.scores[0, 0] * 0).astype(jnp.uint8)
            return tag, imgs0 + tag

        dt_raw = bench._run_chained(step_raw, imgs0, 10)
        dt_full = bench._run_chained(step_full, imgs0, 10)
        res[f"b{b}"] = {
            "raw_ms": round(dt_raw * 1e3, 2),
            "full_ms": round(dt_full * 1e3, 2),
            "post_ms": round((dt_full - dt_raw) * 1e3, 2),
            "raw_ms_per_img": round(dt_raw * 1e3 / b, 3),
            "full_ms_per_img": round(dt_full * 1e3 / b, 3),
        }
        print(f"# b={b}: raw {dt_raw*1e3:.1f} ms  full "
              f"{dt_full*1e3:.1f} ms  post {(dt_full-dt_raw)*1e3:.1f} "
              f"ms", file=sys.stderr)
    del variables
    gc.collect()
    return res


def main():
    which = set(sys.argv[1:]) or {"b16", "serve", "gen", "spec"}
    bench._enable_compile_cache()
    out = {}
    if os.path.exists(OUT_PATH):
        out = json.load(open(OUT_PATH))
    t0 = time.time()
    if "b16" in which:
        out["b16"] = diag_b16()
        _save(out)
    if "serve" in which:
        out["serve"] = bench.bench_serve(chunks=(8, 16, 32))
        _save(out)
    if "gen" in which:
        out["gen_bf16_b8_tok_s"] = round(bench.bench_gen(b=8), 1)
        _save(out)
    if "spec" in which:
        out["spec"] = bench.bench_spec()
        _save(out)
    if "serve_i8" in which:
        out["serve_i8_prefill"] = bench.bench_serve(
            chunks=(8,), int8_prefill=True)
        _save(out)
        out["serve_i8_full"] = bench.bench_serve(
            chunks=(8,), int8_prefill=True, int8_decode=True)
        _save(out)
        # int8 static marginal for the like-for-like ratio
        out["gen_int8_b8_tok_s"] = round(
            bench.bench_gen(b=8, int8=True), 1)
        _save(out)
    if "serve_ab" in which:
        # same-session A/B (transport jitter moves cross-session
        # serving numbers ~2-10%): bf16 vs int8-prefill, chunk 8
        out["serve_ab_bf16"] = bench.bench_serve(chunks=(8,))
        _save(out)
        out["serve_ab_i8p"] = bench.bench_serve(chunks=(8,),
                                                int8_prefill=True)
        _save(out)
    if "int4" in which:
        # same-session precision ladder for the HBM-bound decode:
        # bf16 vs int8 vs int4 marginal tok/s (b=8 and b=1), plus the
        # int4 serving row against its own marginal
        out["i4_gen_bf16_b8"] = round(bench.bench_gen(b=8), 1)
        _save(out)
        out["i4_gen_int8_b8"] = round(bench.bench_gen(b=8, int8=True), 1)
        _save(out)
        out["i4_gen_int4_b8"] = round(bench.bench_gen(b=8, int4=True), 1)
        _save(out)
        out["i4_gen_bf16_b1"] = round(bench.bench_gen(b=1), 1)
        _save(out)
        out["i4_gen_int4_b1"] = round(bench.bench_gen(b=1, int4=True), 1)
        _save(out)
        out["i4_serve_int4_c8"] = bench.bench_serve(
            chunks=(8,), int4_decode=True)
        _save(out)
    if "pb" in which:
        # piggyback chunked prefill vs classic admission, same
        # session: the pb decode chunk carries F=ceil(384/chunk)
        # prompt rows per step, so sweep chunk (F=48 vs 24) and pair
        # with the int8 decode tree (where decode steps are cheapest
        # and prefill is relatively biggest).
        out["pb_classic_c8"] = bench.bench_serve(chunks=(8,))
        _save(out)
        out["pb_piggy_c8"] = bench.bench_serve(chunks=(8,),
                                               piggyback=True)
        _save(out)
        out["pb_piggy_c16"] = bench.bench_serve(chunks=(16,),
                                                piggyback=True)
        _save(out)
        out["pb_classic_i8_c8"] = bench.bench_serve(
            chunks=(8,), int8_decode=True)
        _save(out)
        out["pb_piggy_i8_c8"] = bench.bench_serve(
            chunks=(8,), int8_decode=True, piggyback=True)
        _save(out)
    print(f"# total {time.time() - t0:.0f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
