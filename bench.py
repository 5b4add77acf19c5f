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
    # init on host CPU (much faster than compiling the init program
    # through the device), then transfer once
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = init_variables(cfg, seed=0)
        variables = jax.device_put(variables, jax.devices()[0])
    except Exception:
        variables = init_variables(cfg, seed=0)
    h, w = cfg.img_size
    k = cfg.num_classes

    rng = np.random.default_rng(0)
    wtxt = jnp.asarray(rng.standard_normal((k, cfg.embed_dims))
                       .astype(np.float32))

    def run_chained(b, iters):
        """Serialized timing: iteration i's input depends on output
        i-1, with ONE host readback at the end. This measures true
        device time even on backends whose block_until_ready does not
        synchronize (the tunneled axon transport here), and amortizes
        the host<->device RTT over all iterations."""
        imgs0 = jnp.asarray(rng.integers(0, 255, (b, h, w, 3))
                            .astype(np.uint8))
        sf = jnp.ones((b, 2), jnp.float32)
        pad = jnp.zeros((b, 4), jnp.float32)
        ori = jnp.full((b, 2), float(h), jnp.float32)

        def step(imgs):
            det = detect_step(cfg, variables, imgs, wtxt, sf, pad, ori)
            # 1-byte data dependency feeding the next iteration
            tag = (det.scores[0, 0] * 0).astype(jnp.uint8)
            return det, imgs0 + tag

        det, imgs = step(imgs0)            # compile
        _ = float(np.asarray(det.scores[0, 0]))  # sync warmup
        # several trials, best wins: the first executions of a freshly
        # compiled program can be orders of magnitude slower on
        # tunneled transports before reaching steady state
        best_dt = float("inf")
        for _trial in range(4):
            imgs = imgs0
            t0 = time.perf_counter()
            for _ in range(iters):
                det, imgs = step(imgs)
            _ = float(np.asarray(det.scores[0, 0]))  # sync end
            best_dt = min(best_dt,
                          (time.perf_counter() - t0) / iters)
        return best_dt

    best = 0.0
    batches = (8, 16) if on_tpu else (1,)
    iters = 15 if on_tpu else 2
    for b in batches:
        try:
            dt = run_chained(b, iters)
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
