"""int4/int8 decode-quantization quality gate.

Weight-only int4 (models/quant) is lossy, and its damage depends on
the CHECKPOINT — the in-repo tests pin the mechanics on random weights
only. This module is the user-facing gate: given a (cfg, params) pair
(random init here, a real converted checkpoint in deployment), it
measures the three quantities that decide whether --int4-decode is
safe to enable:

1. **first-step logit cosine** — direction of the next-token
   distribution right after prefill, per prompt (the most sensitive
   single-step probe);
2. **greedy-token agreement** — how many of the quantized decode's
   greedy tokens match the full-precision stream, per prompt (the
   user-visible outcome for generation);
3. **REC score delta** — grounding scores with the text-layer kernels
   replaced by their dequantized-quantized versions vs the originals
   (the scoring path never reads decode_params, so this isolates the
   WEIGHT damage on the grounding head: max/mean |delta-sigmoid| and
   top-1 proposal agreement).

Driven by cli/quant_gate.py; calibration (models/quant_calib) plugs in
as ``calib=``. No reference counterpart (the reference ships no
quantization; wedetect_ref/models/qwen3vl_grounding.py:311-379 serves
full-precision HF ``.generate()``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from wedetect_tpu.models.quant import (_LAYER_MATMULS,
                                       dequantize_decode_params,
                                       quantized_bytes)


def substitute_text_kernels(params, qparams):
    """Full param tree with every text-layer matmul kernel replaced by
    its dequantized-quantized twin — what the grounding/scoring
    forward would see if the quantized weights were the model."""
    deq = dequantize_decode_params(qparams)
    text = dict(params["text"])
    for name, layer in params["text"].items():
        if not name.startswith("layer"):
            continue
        nl = dict(layer)
        for k in _LAYER_MATMULS:
            nl[k] = {"kernel": deq["text"][name][k]["kernel"].astype(
                layer[k]["kernel"].dtype)}
        text[name] = nl
    out = dict(params)
    out["text"] = text
    return out


def first_logit_cosines(cfg, grid_h, grid_w, params, qparams,
                        patches, input_ids, attn_mask, position_ids,
                        visual_start, boxes_xyxy, ori_wh):
    """Per-row cosine between the full-precision and quantized LM-head
    logits at each prompt's last real position."""
    from wedetect_tpu.models.ref import RefModules
    from wedetect_tpu.models.ref_generate import _lm_logits
    from wedetect_tpu.train.ref_lm import _hidden_states

    mod = RefModules(cfg, grid_h, grid_w)
    b = input_ids.shape[0]
    hidden = mod.apply(
        {"params": params}, jnp.asarray(patches),
        jnp.asarray(input_ids), jnp.asarray(attn_mask),
        jnp.asarray(position_ids), jnp.asarray(boxes_xyxy),
        jnp.asarray(ori_wh), visual_start,
        jnp.full((b, 1), -1, jnp.int32), method=_hidden_states)
    last = np.asarray(attn_mask).sum(axis=1) - 1
    cosines = []
    for r in range(b):
        h = hidden[r, int(last[r])]
        lf = np.asarray(_lm_logits(params, h), np.float64)
        lq = np.asarray(_lm_logits(qparams, h), np.float64)
        cosines.append(float(
            np.dot(lf, lq)
            / max(np.linalg.norm(lf) * np.linalg.norm(lq), 1e-30)))
    return np.array(cosines)


def greedy_agreement(cfg, grid_h, grid_w, params, qparams, patches,
                     input_ids, attn_mask, position_ids, visual_start,
                     next_pos, boxes_xyxy, ori_wh, max_new: int,
                     eos_id: int, pad_id: int = 0):
    """Greedy decode with and without decode_params; returns
    (agree_len (B,), eff_len (B,)) — the leading-match length against
    the full-precision stream and that stream's effective length
    (through eos, else max_new)."""
    from wedetect_tpu.models.ref_generate import ref_generate

    args = (cfg, grid_h, grid_w, params, jnp.asarray(patches),
            jnp.asarray(input_ids), jnp.asarray(attn_mask),
            jnp.asarray(position_ids), visual_start,
            jnp.asarray(next_pos), jnp.asarray(boxes_xyxy),
            jnp.asarray(ori_wh), max_new, eos_id)
    full = np.asarray(ref_generate(*args, pad_id=pad_id))
    quant = np.asarray(ref_generate(*args, pad_id=pad_id,
                                    decode_params=qparams))
    b = full.shape[0]
    agree = np.empty(b, np.int64)
    eff = np.empty(b, np.int64)
    for r in range(b):
        eos_at = np.nonzero(full[r] == eos_id)[0]
        eff[r] = int(eos_at[0]) + 1 if len(eos_at) else max_new
        neq = np.nonzero(full[r, :eff[r]] != quant[r, :eff[r]])[0]
        agree[r] = int(neq[0]) if len(neq) else eff[r]
    return agree, eff


def rec_score_delta(cfg, grid_h, grid_w, params, qparams, patches,
                    input_ids, attn_mask, position_ids, visual_start,
                    boxes_xyxy, ori_wh, object_positions):
    """REC scoring with original vs substituted (dequantized) text
    kernels. Returns dict(max_abs_delta, mean_abs_delta, top1_agree)
    over sigmoid scores / per-row argmax proposals."""
    from wedetect_tpu.models.ref import ref_score_step

    params_sub = substitute_text_kernels(params, qparams)

    def run(p):
        logits = np.asarray(ref_score_step(
            cfg, grid_h, grid_w, p, jnp.asarray(patches),
            jnp.asarray(input_ids), jnp.asarray(attn_mask),
            jnp.asarray(position_ids), visual_start,
            jnp.asarray(boxes_xyxy), jnp.asarray(ori_wh),
            jnp.asarray(object_positions)))
        return 1.0 / (1.0 + np.exp(-logits))

    sf, sq = run(params), run(params_sub)
    return {
        "max_abs_delta": float(np.abs(sf - sq).max()),
        "mean_abs_delta": float(np.abs(sf - sq).mean()),
        "top1_agree": float(
            (sf.argmax(axis=1) == sq.argmax(axis=1)).mean()),
    }


def gate_report(cfg, grid_h, grid_w, params, qparams, gen_batch,
                rec_batch, max_new: int, eos_id: int,
                pad_id: int = 0):
    """Run all three probes and assemble the gate's JSON-ready dict.

    gen_batch: (patches, input_ids, attn_mask, position_ids,
    visual_start, next_pos, boxes_xyxy, ori_wh); rec_batch: same minus
    next_pos plus object_positions, or None to skip the REC probe."""
    (patches, ids, mask, pos, vs, next_pos, boxes, ori) = gen_batch
    cos = first_logit_cosines(cfg, grid_h, grid_w, params, qparams,
                              patches, ids, mask, pos, vs, boxes, ori)
    agree, eff = greedy_agreement(
        cfg, grid_h, grid_w, params, qparams, patches, ids, mask, pos,
        vs, next_pos, boxes, ori, max_new, eos_id, pad_id)
    frac = agree / np.maximum(eff, 1)
    report = {
        "logit_cos_mean": float(cos.mean()),
        "logit_cos_min": float(cos.min()),
        "greedy_agree_tokens_mean": float(agree.mean()),
        "greedy_agree_frac_mean": float(frac.mean()),
        "greedy_agree_frac_min": float(frac.min()),
        "eff_len_mean": float(eff.mean()),
        "n_prompts": int(len(cos)),
        "quantized_bytes": int(quantized_bytes(
            {"text": qparams["text"], "lm_head": qparams["lm_head"]})),
    }
    if rec_batch is not None:
        (rpatches, rids, rmask, rpos, rvs, rboxes, rori, robj) = \
            rec_batch
        report["rec"] = rec_score_delta(
            cfg, grid_h, grid_w, params, qparams, rpatches, rids,
            rmask, rpos, rvs, rboxes, rori, robj)
    return report
