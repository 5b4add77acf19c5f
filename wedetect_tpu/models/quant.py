"""Weight-only int8 quantization for the generation decode path.

The KV-cache decode step (models/ref_generate) is HBM-bandwidth-bound:
every generated token streams the full decoder weight set from HBM
(PERF.md "Text generation" — the 2B f32 step sits at the ~9.5 GB/step
memory roofline; bf16 halves it). Weight-only int8 halves it AGAIN:
kernels are stored as int8 with a per-output-channel f32 scale, and the
matmul reads int8 from HBM, upcasting inside the fused dot
(``(y @ w8.astype(dt)) * scale`` — XLA fuses the convert into the dot
operand read, so HBM traffic is the int8 bytes).

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


def matmul_any(y, leaf, dt):
    """y @ kernel for a full-precision ({kernel}) or quantized
    ({w8, scale}) leaf, in compute dtype ``dt``. For quantized leaves
    the dot reads int8 from HBM (the convert fuses into the dot) and
    the per-output-channel scale multiplies the dot result — exactly
    y @ (w8 * scale) since scale is constant along the contraction."""
    if "w8" in leaf:
        return (y @ leaf["w8"].astype(dt)) * leaf["scale"].astype(dt)
    return y @ leaf["kernel"].astype(dt)


def quantize_decode_params(params):
    """Build the decode-param tree for ref_generate(decode_params=...).

    Quantizes the seven matmul kernels of every text layer plus the LM
    head; copies norms/embedding through unchanged. ~4x smaller than
    f32 (2x vs bf16) for the matmul weights, which dominate."""
    text = params["text"]
    qtext = {}
    for name, layer in text.items():
        if not name.startswith("layer"):
            qtext[name] = layer          # final "norm"
            continue
        ql = {}
        for k, leaf in layer.items():
            if k in _LAYER_MATMULS:
                ql[k] = quantize_weight(leaf["kernel"], axis=0)
            else:
                ql[k] = leaf             # input_ln/post_ln/q_norm/k_norm
        qtext[name] = ql
    out = {"text": qtext, "embed": params["embed"]}
    if "lm_head" in params:
        out["lm_head"] = quantize_weight(params["lm_head"]["kernel"],
                                         axis=0)
    else:
        # tied head: quantize the transposed embedding (per-vocab-row
        # scale); the un-transposed table stays for the token lookup
        emb = params["embed"]["embed_tokens"]["embedding"]
        out["lm_head"] = quantize_weight(jnp.asarray(emb).T, axis=0)
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
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(qparams)


def quantized_bytes(qparams):
    """Total bytes of the quantized tree (diagnostic)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(qparams))
