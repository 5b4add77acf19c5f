"""HF Qwen3-VL(-Grounding) torch checkpoint -> JAX pytree converter.

Maps the HF state-dict naming (model.visual.*, model.language_model.*,
plus the reference's grounding additions: model.image_pos_projector,
model.object_vision_projector, model.object_pos_projector,
model.first_scale_conv1/2, model.first_scale_norm, model.second_scale_conv,
model.merge, out_proj — reference
wedetect_ref/models/qwen3vl_referring.py:97-141, 351-363) into the flax
trees of wedetect_tpu.nn.qwen3vl / models.ref.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from wedetect_tpu.nn.qwen3vl import RefCfg

Flat = Mapping[str, np.ndarray]


def _t(w):
    return np.transpose(np.asarray(w))


def convert_vision(sd: Flat, cfg: RefCfg, p: str = "model.visual."
                   ) -> Dict:
    v = cfg.vision
    g = lambda k: np.asarray(sd[p + k])  # noqa: E731
    params: Dict = {
        "patch_embed": {
            "kernel": np.asarray(sd[p + "patch_embed.proj.weight"])
            .reshape(v.hidden, -1).T,
            "bias": g("patch_embed.proj.bias")},
        "pos_embed": g("pos_embed.weight"),
    }

    def merger(q):
        return {
            "norm": {"scale": np.asarray(sd[q + "norm.weight"]),
                     "bias": np.asarray(sd[q + "norm.bias"])},
            "fc1": {"kernel": _t(sd[q + "linear_fc1.weight"]),
                    "bias": np.asarray(sd[q + "linear_fc1.bias"])},
            "fc2": {"kernel": _t(sd[q + "linear_fc2.weight"]),
                    "bias": np.asarray(sd[q + "linear_fc2.bias"])},
        }

    for i in range(v.depth):
        b = f"{p}blocks.{i}."
        params[f"block{i}"] = {
            "norm1": {"scale": np.asarray(sd[b + "norm1.weight"]),
                      "bias": np.asarray(sd[b + "norm1.bias"])},
            "norm2": {"scale": np.asarray(sd[b + "norm2.weight"]),
                      "bias": np.asarray(sd[b + "norm2.bias"])},
            "qkv": {"kernel": _t(sd[b + "attn.qkv.weight"]),
                    "bias": np.asarray(sd[b + "attn.qkv.bias"])},
            "proj": {"kernel": _t(sd[b + "attn.proj.weight"]),
                     "bias": np.asarray(sd[b + "attn.proj.bias"])},
            "fc1": {"kernel": _t(sd[b + "mlp.linear_fc1.weight"]),
                    "bias": np.asarray(sd[b + "mlp.linear_fc1.bias"])},
            "fc2": {"kernel": _t(sd[b + "mlp.linear_fc2.weight"]),
                    "bias": np.asarray(sd[b + "mlp.linear_fc2.bias"])},
        }
    params["merger"] = merger(p + "merger.")
    for j in range(len(v.deepstack_idx)):
        params[f"deepstack{j}"] = merger(
            f"{p}deepstack_merger_list.{j}.")
    return params


def convert_text(sd: Flat, cfg: RefCfg,
                 p: str = "model.language_model.") -> Dict:
    t = cfg.text
    params: Dict = {}
    for i in range(t.layers):
        b = f"{p}layers.{i}."
        params[f"layer{i}"] = {
            "input_ln": {"scale": np.asarray(
                sd[b + "input_layernorm.weight"])},
            "post_ln": {"scale": np.asarray(
                sd[b + "post_attention_layernorm.weight"])},
            "q_proj": {"kernel": _t(sd[b + "self_attn.q_proj.weight"])},
            "k_proj": {"kernel": _t(sd[b + "self_attn.k_proj.weight"])},
            "v_proj": {"kernel": _t(sd[b + "self_attn.v_proj.weight"])},
            "o_proj": {"kernel": _t(sd[b + "self_attn.o_proj.weight"])},
            "q_norm": {"scale": np.asarray(
                sd[b + "self_attn.q_norm.weight"])},
            "k_norm": {"scale": np.asarray(
                sd[b + "self_attn.k_norm.weight"])},
            "gate_proj": {"kernel": _t(sd[b + "mlp.gate_proj.weight"])},
            "up_proj": {"kernel": _t(sd[b + "mlp.up_proj.weight"])},
            "down_proj": {"kernel": _t(sd[b + "mlp.down_proj.weight"])},
        }
    params["norm"] = {"scale": np.asarray(sd[p + "norm.weight"])}
    return params


def convert_embedder(sd: Flat, p: str = "model.language_model.") -> Dict:
    return {"embed_tokens": {
        "embedding": np.asarray(sd[p + "embed_tokens.weight"])}}


def _mlp2x(sd: Flat, q: str) -> Dict:
    """mlp2x_gelu Sequential: Linear(0) -> GELU -> Linear(2)."""
    return {
        "fc0": {"kernel": _t(sd[q + "0.weight"]),
                "bias": np.asarray(sd[q + "0.bias"])},
        "fc1": {"kernel": _t(sd[q + "2.weight"]),
                "bias": np.asarray(sd[q + "2.bias"])},
    }


def convert_grounding_extras(sd: Flat, p: str = "model.") -> Dict:
    """The reference's added modules (projectors, scale convs, merge,
    out_proj)."""
    params = {
        "image_pos_projector": _mlp2x(sd, p + "image_pos_projector."),
        "object_vision_projector": _mlp2x(
            sd, p + "object_vision_projector."),
        "object_pos_projector": _mlp2x(sd, p + "object_pos_projector."),
        "first_scale_conv1": {
            "kernel": np.asarray(sd[p + "first_scale_conv1.weight"]),
            "bias": np.asarray(sd[p + "first_scale_conv1.bias"])},
        "first_scale_conv2": {
            "kernel": np.asarray(sd[p + "first_scale_conv2.weight"]),
            "bias": np.asarray(sd[p + "first_scale_conv2.bias"])},
        "second_scale_conv": {
            "kernel": np.asarray(sd[p + "second_scale_conv.weight"]),
            "bias": np.asarray(sd[p + "second_scale_conv.bias"])},
        "first_scale_norm": {
            "scale": np.asarray(sd[p + "first_scale_norm.weight"]),
            "bias": np.asarray(sd[p + "first_scale_norm.bias"])},
        "merge": {"kernel": _t(sd[p + "merge.weight"]),
                  "bias": np.asarray(sd[p + "merge.bias"])},
    }
    # the referring scorer has the binary head; the stage-1/2
    # generation twin (qwen3vl_grounding.py) does not — flax only
    # resolves params lazily, so scoring paths still fail loudly if
    # out_proj is missing while generation works without it
    if "out_proj.weight" in sd:
        params["out_proj"] = {
            "kernel": _t(sd["out_proj.weight"]),
            "bias": np.asarray(sd["out_proj.bias"])}
    return params


def convert_ref_model(sd: Flat, cfg: RefCfg) -> Dict:
    """Full grounding model state dict -> {vision, text, embed, extras}."""
    import jax
    import jax.numpy as jnp

    out = {
        "vision": convert_vision(sd, cfg),
        "text": convert_text(sd, cfg),
        "embed": convert_embedder(sd),
        "extras": convert_grounding_extras(sd),
    }
    # the stage-1/2 twin (qwen3vl_grounding.py:315) carries an UNTIED
    # lm_head Linear for generation; map it when present so
    # models/ref_generate + train/ref_lm use it over the tied embedding
    if "lm_head.weight" in sd:
        out["lm_head"] = {"kernel": sd["lm_head.weight"].T}
    return jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x, np.float32)), out)
