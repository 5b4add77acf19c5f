"""Benchmark: WeDetect-Base end-to-end detection throughput on one chip.

Prints ONE JSON line:
  {"metric": "wedetect_base_640_img_per_s", "value": N,
   "unit": "img/s", "vs_baseline": N}

Baseline: the reference reports 35.1 FPS for WeDetect-Base @640 on an
(unstated, A100-class) GPU (BASELINE.md Table 1). The benchmark runs
the FULL graph — uint8 input, /255, ConvNeXt-B, BiFPAN, head,
K=80-class contrastive scoring, DFL decode, static NMS to 300 boxes —
with bf16 compute, batch sweep, steady-state timing.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.configs import wedetect_base
    from wedetect_tpu.models.wedetect import detect_step, init_variables

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    cfg = wedetect_base(compute_dtype="bfloat16", num_classes=80)
    variables = init_variables(cfg, seed=0)
    h, w = cfg.img_size
    k = cfg.num_classes

    rng = np.random.default_rng(0)
    wtxt = jnp.asarray(rng.standard_normal((k, cfg.embed_dims))
                       .astype(np.float32))

    best = 0.0
    batches = (1, 4, 8, 16) if on_tpu else (1,)
    iters = 20 if on_tpu else 2
    for b in batches:
        imgs = jnp.asarray(rng.integers(0, 255, (b, h, w, 3))
                           .astype(np.uint8))
        sf = jnp.ones((b, 2), jnp.float32)
        pad = jnp.zeros((b, 4), jnp.float32)
        ori = jnp.full((b, 2), float(h), jnp.float32)
        try:
            det = detect_step(cfg, variables, imgs, wtxt, sf, pad, ori)
            det.boxes.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                det = detect_step(cfg, variables, imgs, wtxt, sf, pad,
                                  ori)
            det.boxes.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            ips = b / dt
            print(f"# b={b}: {ips:.1f} img/s ({dt * 1e3:.1f} ms)",
                  file=sys.stderr)
            best = max(best, ips)
        except Exception as e:  # OOM at large batch etc.
            print(f"# b={b} failed: {type(e).__name__}", file=sys.stderr)
            break

    baseline = 35.1  # reference WeDetect-Base FPS (BASELINE.md)
    print(json.dumps({
        "metric": "wedetect_base_640_img_per_s",
        "value": round(best, 2),
        "unit": "img/s",
        "vs_baseline": round(best / baseline, 3),
    }))


if __name__ == "__main__":
    main()
