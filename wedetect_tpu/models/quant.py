"""Weight-only int8 / int4 quantization for the generation decode path.

The KV-cache decode step (models/ref_generate) is HBM-bandwidth-bound:
every generated token streams the full decoder weight set from HBM
(PERF.md "Text generation" — the 2B f32 step sits at the ~9.5 GB/step
memory roofline; bf16 halves it). Weight-only int8 halves it AGAIN:
kernels are stored as int8 with a per-output-channel f32 scale, and the
matmul reads int8 from HBM, upcasting inside the fused dot
(``(y @ w8.astype(dt)) * scale`` — XLA fuses the convert into the dot
operand read, so HBM traffic is the int8 bytes).

Weight-only int4 halves it a THIRD time. XLA:TPU stores ``s4`` arrays
nibble-packed in HBM and fuses the s4->bf16 upcast into the dot operand
read (measured: tools/int4_probe.json — the 2048x151936 LM-head dot
streams at 0.75 ms vs int8's 0.95 and bf16's 1.40). Two platform-driven
design choices:

- **Rank-1 two-sided scales, not groups.** Group-wise scales (the GPU
  int4 recipe) vary along the contraction axis, so they cannot ride the
  output epilogue — XLA would materialize a dequantized copy (or a
  per-group partial-sum tensor), spending the very HBM bytes int4
  saves. Instead ``w ~= diag(rscale) @ q @ diag(scale)``: the row scale
  multiplies the ACTIVATION (elementwise on (B, H) — free), the column
  scale the OUTPUT, and the dot streams pure s4. The scales come from a
  few Sinkhorn-style absmax alternations with a final column pass that
  guarantees codes fit in [-7, 7] with no clipping.
- **Packed-int8 storage, in-jit unpack.** s4 arrays cannot cross a jit
  boundary on this platform (relayout device_put of s4 RecursionErrors
  — NOTES.md round 4), so quantized int4 leaves store two codes per
  int8 byte ({"w4p"}) and the consumer unpacks to s4 INSIDE its jit:
  either inline per matmul (one-shot uses: LM head at admission), or
  once per call via ``prepare_decode_params`` before a decode
  ``lax.scan`` — the unpacked s4 tree is materialized behind an
  ``optimization_barrier`` and carried as a scan constant, so every
  decode step streams s4 bytes while only the int8-packed tree (same
  byte count) ever crosses the dispatch boundary.

int4 is lossier than int8 (4-bit codes; the rank-1 scaling recovers
row/column dynamic range but not per-group structure). Mechanics are
pinned exactly (pow2-scale bitwise test, packing round-trip over all
16 nibbles); accuracy on a real checkpoint must be validated per
deployment — run ``cli/quant_gate`` (logit cosine, greedy-token
agreement, REC score deltas) on the target checkpoint before enabling
--int4-decode, and optionally fit activation-calibrated scales
(``quantize_weight4(act_rms=...)`` via models/quant_calib or
``RefScorer.calibrate_decode``). The in-repo tests pin the envelope on
random weights only.

Cross-program determinism caveat (int4): ref_generate's scan and
GenServer's chunked decode compute step-identical math (their layer
twins agree BITWISE in eager mode — measured round 4), but they are
different jitted programs and XLA may reassociate their reductions
differently, so logits can differ at ULP level between the two. int4's
coarse codes make exact/near logit ties common, so a greedy argmax can
flip at such a tie and the serving engine's tokens may diverge from
the static path's on some prompts (observed once at tiny scale; both
outputs are equally valid argmaxes of the quantized model). Within ONE
program the schedule invariants hold exactly: chunk size, admission
order, and slot assignment never change GenServer's tokens, and
tests/test_serve.py pins server==ref_generate token-exactness for
int8/bf16 and at the int4 test's pinned seed.

Scope is deliberately decode-only: prefill is compute-bound and runs
once per prompt, so it keeps full-precision params; the quantized tree
feeds only the per-token decode layers and the LM head (the LM head —
vocab x hidden — is the single largest matmul of a decode step, so it
is always included; tied-embedding checkpoints get a quantized
transposed copy under ``lm_head`` while the f32/bf16 embedding table is
kept for the token lookup, whose per-step HBM cost is B rows).

No reference counterpart: the reference inherits HF ``.generate()``
(wedetect_ref/models/qwen3vl_grounding.py:311-379) with no quantized
serving path. Numerics: symmetric per-channel absmax (scale =
max|w| / 127), the standard weight-only recipe. Mechanics are pinned
in tests/test_quant.py by (a) a power-of-two-scale case where the
int8 path equals the pre-dequantized path BITWISE (power-of-two
scaling commutes with FP rounding, so the two association orders
agree exactly) and (b) greedy-token agreement between the int8 decode
and its dequantized oracle; accuracy is pinned by logit cosine
against the full-precision decode.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# decoder-layer matmuls quantized per layer (nn/qwen3vl.TextLayer tree)
_LAYER_MATMULS = ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj")


def quantize_weight(w, axis=0):
    """Symmetric per-channel absmax int8: returns {w8, scale} with
    ``w8 * scale ~= w``; scale is per output channel (reduces over
    ``axis``, the contraction axis)."""
    wf = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": jnp.squeeze(scale, axis=axis)}


def quantize_weight4(w, axis=0, iters=2, act_rms=None,
                     alphas=(0.0, 0.25, 0.5),
                     clip_grid=(1.0, 0.95, 0.9, 0.85, 0.8, 0.7)):
    """Rank-1 two-sided symmetric int4: returns
    ``{w4p, rscale, scale}`` with
    ``diag(rscale) @ unpack(w4p) @ diag(scale) ~= w``.

    ``rscale`` (H,) multiplies the activation, ``scale`` (O,) the dot
    output, so the matmul streams pure s4 (module docstring). Scales
    are fit by alternating row/column absmax normalization (Sinkhorn
    style); the final column pass makes every column's absmax map to
    exactly +/-7, so codes never clip. ``w4p`` packs contraction-axis
    row pairs (2i -> low nibble, 2i+1 -> high) into one int8.

    ``act_rms`` (H,) — optional calibration statistics: the RMS of the
    matmul's input activation per contraction channel
    (models/quant_calib collects them from real prompts). When given,
    the fit minimizes the ACTIVATION-WEIGHTED reconstruction error
    sum_io a_i^2 (w_io - deq_io)^2 — the first-order proxy for the
    output error E||y @ w - y @ deq||^2 — by searching (a) AWQ-style
    row re-weighting alphas (rows with large activations get finer
    grids; codes may then clip at +/-7) and (b) per-column clip
    factors beta <= 1 (clipping the absmax outlier of a column buys a
    finer grid for everything else). alpha=0, beta=1 — the plain
    uncalibrated fit — is always in the search space, so the
    calibrated fit NEVER does worse under the weighted metric. The
    leaf format is unchanged; consumers cannot tell the fits apart."""
    assert axis == 0, "contraction axis must be 0"
    if act_rms is not None:
        return _fit_int4_calibrated(np.asarray(w, np.float32),
                                    np.asarray(act_rms, np.float32),
                                    iters, alphas, clip_grid)
    wf = jnp.asarray(w).astype(jnp.float32)
    h, o = wf.shape
    assert h % 2 == 0, "contraction dim must be even to nibble-pack"
    wa = jnp.maximum(jnp.abs(wf), 1e-12)
    r = jnp.ones((h,), jnp.float32)
    for _ in range(iters):
        c = jnp.max(wa / r[:, None], axis=0)
        r = jnp.max(wa / c[None, :], axis=1)
    c = jnp.max(wa / r[:, None], axis=0)          # colmax == 1 exactly
    q = jnp.clip(jnp.round(wf / (r[:, None] * c[None, :]) * 7.0),
                 -7, 7).astype(jnp.int8)
    return {"w4p": pack_int4(q), "rscale": r, "scale": c / 7.0}


def _fit_int4_calibrated(wf, act_rms, iters, alphas, clip_grid,
                         col_chunk=4096):
    """Activation-weighted int4 fit (host-side numpy — quantization is
    a one-time setup step; column-chunked so the LM head's
    (hidden, vocab) never materializes more than one (H, col_chunk)
    temp per candidate). See quantize_weight4's docstring for the
    objective; returns the same {w4p, rscale, scale} leaf."""
    h, o = wf.shape
    assert h % 2 == 0, "contraction dim must be even to nibble-pack"
    a = np.maximum(act_rms, 1e-12).astype(np.float32)
    a = a / a.mean()
    w2 = (a * a)[:, None]                     # row weights of the MSE
    best_total, best = np.inf, None
    for alpha in alphas:
        s_act = a ** np.float32(alpha)
        wa = np.maximum(np.abs(wf) * s_act[:, None], 1e-12)
        r = np.ones(h, np.float32)
        for _ in range(iters):
            c = (wa / r[:, None]).max(axis=0)
            r = (wa / c[None, :]).max(axis=1)
        c = (wa / r[:, None]).max(axis=0)
        r = r / s_act                     # undo the fit re-weighting
        codes = np.empty((h, o), np.int8)
        scale = np.empty(o, np.float32)
        total = 0.0
        for st in range(0, o, col_chunk):
            sl = slice(st, min(st + col_chunk, o))
            wb = wf[:, sl]
            err_best = np.full(wb.shape[1], np.inf, np.float32)
            for beta in clip_grid:
                sc = (c[sl] * np.float32(beta)) / 7.0
                cd = np.clip(np.rint(wb / (r[:, None] * sc[None, :])),
                             -7, 7).astype(np.int8)
                err = (np.square(wb - r[:, None] * cd * sc[None, :])
                       * w2).sum(axis=0)
                upd = err < err_best
                err_best = np.where(upd, err, err_best)
                codes[:, sl] = np.where(upd[None, :], cd, codes[:, sl])
                scale[sl] = np.where(upd, sc, scale[sl])
            total += float(err_best.sum())
        if total < best_total:
            best_total = total
            best = (codes.copy(), r, scale)
    codes, r, scale = best
    return {"w4p": pack_int4(jnp.asarray(codes)),
            "rscale": jnp.asarray(r), "scale": jnp.asarray(scale)}


def pack_int4(q):
    """(H, O) int8 codes in [-8, 7] -> (H/2, O) int8, row 2i in the
    low nibble and row 2i+1 in the high nibble of byte i."""
    qq = jax.lax.bitcast_convert_type(jnp.asarray(q), jnp.uint8)
    qq = qq.reshape(q.shape[0] // 2, 2, q.shape[1])
    packed = (qq[:, 0] & 0x0F) | ((qq[:, 1] & 0x0F) << 4)
    return jax.lax.bitcast_convert_type(packed, jnp.int8)


def unpack_int4(w4p):
    """Inverse of pack_int4, producing an s4 array — XLA ops only, so
    it runs inside the consuming jit (s4 cannot cross jit boundaries
    on this platform; module docstring)."""
    lo = jnp.right_shift(jnp.left_shift(w4p, 4), 4)  # sign-extended
    hi = jnp.right_shift(w4p, 4)                     # arithmetic
    h2, o = w4p.shape
    q = jnp.stack([lo, hi], axis=1).reshape(2 * h2, o)
    return q.astype(jnp.int4)


def matmul_any(y, leaf, dt):
    """y @ kernel for a full-precision ({kernel}) or quantized
    ({w8, scale} int8 / {w4p, rscale, scale} packed-int4 /
    {w4, rscale, scale} pre-unpacked s4) leaf, in compute dtype ``dt``.
    For quantized leaves the dot reads int8/s4 from HBM (the convert
    fuses into the dot) and the per-output-channel scale multiplies
    the dot result; int4 additionally multiplies the activation by the
    per-contraction-row scale — exactly
    ``(y * rscale) @ q * scale == y @ (diag(r) q diag(s))`` since each
    scale is constant along the axis it rides."""
    if "w8" in leaf:
        return (y @ leaf["w8"].astype(dt)) * leaf["scale"].astype(dt)
    if "w4" in leaf or "w4p" in leaf:
        q4 = leaf["w4"] if "w4" in leaf else unpack_int4(leaf["w4p"])
        return ((y * leaf["rscale"].astype(dt)) @ q4.astype(dt)) \
            * leaf["scale"].astype(dt)
    return y @ leaf["kernel"].astype(dt)


def prepare_decode_params(dp):
    """Unpack every packed-int4 leaf of a decode-param tree to s4,
    materialized behind an optimization_barrier — call INSIDE a jit,
    before its decode ``lax.scan``, so each scan step streams s4 bytes
    and the unpack runs once per dispatch (module docstring). Trees
    with no int4 leaves pass through unchanged (f32/bf16/int8)."""
    def walk(node):
        if isinstance(node, dict):
            if "w4p" in node:
                return {"w4": jax.lax.optimization_barrier(
                            unpack_int4(node["w4p"])),
                        "rscale": node["rscale"],
                        "scale": node["scale"]}
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(dp)


def quantize_decode_params(params, bits: int = 8, calib=None):
    """Build the decode-param tree for ref_generate(decode_params=...).

    Quantizes the seven matmul kernels of every text layer plus the LM
    head — to int8 (per-output-channel scales) or int4 (``bits=4``:
    nibble-packed codes + rank-1 two-sided scales, module docstring) —
    and copies norms/embedding through unchanged. Matmul weights
    shrink ~4x vs f32 at int8 and ~8x at int4.

    ``calib`` (int4 only): per-matmul activation-RMS statistics from
    models/quant_calib.calibrate_decode_acts —
    ``{"text": {"layer{i}": {matmul: (H,)}}, "lm_head": (H,)}`` —
    enabling quantize_weight4's activation-weighted fit. Missing
    entries fall back to the plain fit."""
    assert bits in (8, 4), bits
    assert calib is None or bits == 4, \
        "calibration applies to the int4 fit only (int8 is plain absmax)"

    def qw(kernel, rms):
        if bits == 8:
            return quantize_weight(kernel, axis=0)
        return quantize_weight4(kernel, axis=0, act_rms=rms)

    calib = calib or {}
    ctext = calib.get("text", {})
    text = params["text"]
    qtext = {}
    for name, layer in text.items():
        if not name.startswith("layer"):
            qtext[name] = layer          # final "norm"
            continue
        crms = ctext.get(name, {})
        ql = {}
        for k, leaf in layer.items():
            if k in _LAYER_MATMULS:
                ql[k] = qw(leaf["kernel"], crms.get(k))
            else:
                ql[k] = leaf             # input_ln/post_ln/q_norm/k_norm
        qtext[name] = ql
    out = {"text": qtext, "embed": params["embed"]}
    head_rms = calib.get("lm_head")
    if "lm_head" in params:
        out["lm_head"] = qw(params["lm_head"]["kernel"], head_rms)
    else:
        # tied head: quantize the transposed embedding (per-vocab-row
        # scale); the un-transposed table stays for the token lookup
        emb = params["embed"]["embed_tokens"]["embedding"]
        out["lm_head"] = qw(jnp.asarray(emb).T, head_rms)
    return out


def dequantize_decode_params(qparams):
    """Inverse of quantize_decode_params (up to rounding): a plain
    {kernel} tree usable as full-precision decode params — the oracle
    for the exact-mechanics test."""
    def walk(node):
        if isinstance(node, dict):
            if "w8" in node:
                return {"kernel": node["w8"].astype(jnp.float32)
                        * node["scale"].astype(jnp.float32)}
            if "w4p" in node:
                q = unpack_int4(node["w4p"]).astype(jnp.float32)
                return {"kernel": node["rscale"][:, None] * q
                        * node["scale"][None, :]}
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(qparams)


def quantized_bytes(qparams):
    """Total bytes of the quantized tree (diagnostic)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(qparams))
