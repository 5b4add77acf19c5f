"""On-chip probe: is weight-only int4 real on this chip?

The KV-cache decode step is HBM-bound (PERF.md "Text generation"):
weight bytes streamed per token set the rate, and weight-only int8
measured 1.3x end-to-end. int4 would halve the weight bytes again IF
XLA:TPU (a) stores s4 arrays packed 2-per-byte in HBM and (b) fuses
the s4->bf16 upcast (+ per-channel scale) into the dot's operand read
instead of materializing a dequantized copy.

Platform gotcha (NOTES.md round-4): the tunneled transport cannot
device_put s4 host buffers, and a cross-jit s4 argument can trigger a
relayout device_put that RecursionErrors. So this probe measures two
regimes:

  in-jit   : one jit builds w4 behind an optimization_barrier, then a
             lax.scan chains ITERS dependent dots over it — the
             marginal per-dot time measures s4 streaming without the
             buffer ever crossing a jit boundary.
  cross-jit: try/except feeding a persistent s4 device array into a
             consuming jit (plain, and with in_shardings pinned to the
             producer's format) — tells us whether GenServer-style
             per-chunk dispatch with int4 decode params is usable.

Shapes: the two decode-dominating matmuls of the 2B config (LM head
2048x151936, MLP 2048x12288) at batch 8, bf16 activations.

Run: python tools/int4_probe.py   (one TPU process at a time!)
Writes tools/int4_probe.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "int4_probe.json")

ITERS = 50


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    B = 8
    out = {}

    def timed_call(fn, *args, trials=3):
        # whole-jit wall time; chained via python dispatch, scalar sync
        r = fn(*args)
        float(np.asarray(r)[0, 0])
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            r = fn(*args)
            float(np.asarray(r)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    for name, (H, O) in (("lm_head", (2048, 151936)),
                         ("mlp", (2048, 12288))):
        y0 = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
        s = jnp.asarray(np.abs(rng.standard_normal(O)) + 0.1,
                        jnp.bfloat16)
        w8 = jnp.asarray(
            rng.integers(-8, 8, (H, O), dtype=np.int8))
        row = {"shape": [H, O], "iters": ITERS}

        # ---- in-jit scan timing: marginal per-dot cost ----
        # y_{i+1} depends on dot_i so the scan body can't be hoisted;
        # the feedback term costs O(B*H) — negligible vs the dot.
        def chain(wmat, scale):
            def body(y, _):
                o = (y @ wmat) * scale
                y2 = y + o[:, :H].astype(jnp.bfloat16) * 1e-6
                return y2, ()
            return body

        def run_bf16(y, w8, s):
            w = lax.optimization_barrier(w8.astype(jnp.bfloat16))
            y, _ = lax.scan(chain(w, s), y, None, length=ITERS)
            return y

        def run_int8(y, w8, s):
            w = lax.optimization_barrier(w8)
            def body(y, _):
                o = (y @ w.astype(jnp.bfloat16)) * s
                return y + o[:, :H].astype(jnp.bfloat16) * 1e-6, ()
            y, _ = lax.scan(body, y, None, length=ITERS)
            return y

        def run_int4(y, w8, s):
            w = lax.optimization_barrier(w8.astype(jnp.int4))
            def body(y, _):
                o = (y @ w.astype(jnp.bfloat16)) * s
                return y + o[:, :H].astype(jnp.bfloat16) * 1e-6, ()
            y, _ = lax.scan(body, y, None, length=ITERS)
            return y

        for tag, fn in (("bf16", run_bf16), ("int8", run_int8),
                        ("int4", run_int4)):
            try:
                t = timed_call(jax.jit(fn), y0, w8, s)
                row[f"{tag}_ms_per_dot"] = round(t / ITERS * 1e3, 4)
            except Exception as e:
                row[f"{tag}_error"] = repr(e)[:200]
            print(f"# {name} {tag}: "
                  f"{row.get(f'{tag}_ms_per_dot', 'ERR')}",
                  file=sys.stderr)

        # ---- cross-jit s4 argument feasibility ----
        try:
            w4 = jax.jit(lambda x: x.astype(jnp.int4))(w8)
            w4.block_until_ready()
            f = jax.jit(
                lambda y, w4, s: (y @ w4.astype(jnp.bfloat16)) * s)
            t = timed_call(f, y0, w4, s)
            row["crossjit_int4_ms"] = round(t * 1e3, 4)
        except Exception as e:
            row["crossjit_int4_error"] = repr(e)[:160]
            # retry with the argument format pinned to the producer's
            try:
                fmt = w4.format
                f = jax.jit(
                    lambda y, w4, s: (y @ w4.astype(jnp.bfloat16)) * s,
                    in_shardings=(None, fmt, None))
                t = timed_call(f, y0, w4, s)
                row["crossjit_int4_pinned_ms"] = round(t * 1e3, 4)
            except Exception as e2:
                row["crossjit_int4_pinned_error"] = repr(e2)[:160]
        print(f"# {name} crossjit: "
              f"{ {k: v for k, v in row.items() if 'cross' in k} }",
              file=sys.stderr)

        out[name] = row
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
