"""CLIP text/vision towers (flax.linen) — alternative backbones.

Behavioral spec: reference
wedetect/models/backbones/mm_backbone.py:28-77
(HuggingCLIPVisionBackbone: CLIPVisionModelWithProjection,
returns last_hidden_state[:, 0] — the CLS token WITHOUT the post
layernorm) and :471-537 (HuggingCLIPLanguageBackbone:
CLIPTextModelWithProjection -> text_embeds -> L2 normalize).

Standard CLIP architecture (published): pre-LN transformer,
quick-gelu MLPs, causal mask for text with EOS pooling + projection,
patch conv (no bias) + CLS token + learned positions for vision.
Registered-but-unused upstream; provided for backbone parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ClipTextCfg:
    vocab_size: int = 49408
    hidden: int = 512
    layers: int = 12
    heads: int = 8
    intermediate: int = 2048
    max_positions: int = 77
    projection_dim: int = 512
    eos_token_id: int = 49407
    ln_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class ClipVisionCfg:
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    image_size: int = 224
    patch: int = 32
    ln_eps: float = 1e-5


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipBlock(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    ln_eps: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        h, d = self.heads, self.hidden // self.heads
        b, l, _ = x.shape
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         name="ln1")(x).astype(self.dtype)
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q")(y)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k")(y)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v")(y)
        q, k, v = (t.reshape(b, l, h, d).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        attn = attn.astype(jnp.float32) + mask_bias
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, self.hidden)
        x = x + nn.Dense(self.hidden, dtype=self.dtype, name="out")(o)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         name="ln2")(x).astype(self.dtype)
        y = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(y)
        y = quick_gelu(y.astype(jnp.float32)).astype(self.dtype)
        return x + nn.Dense(self.hidden, dtype=self.dtype,
                            name="fc2")(y)


class ClipTextTower(nn.Module):
    """input_ids (B, L) -> (B, projection_dim) L2-normalized."""

    cfg: ClipTextCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        b, l = input_ids.shape
        x = nn.Embed(c.vocab_size, c.hidden, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (c.max_positions, c.hidden), jnp.float32)
        x = x + pos[None, :l].astype(self.dtype)
        causal = jnp.tril(jnp.ones((l, l), bool))
        if attention_mask is not None:
            causal = causal[None, :, :] & (
                attention_mask.astype(bool)[:, None, :])
            bias = jnp.where(causal, 0.0, jnp.float32(-1e9))[:, None]
        else:
            bias = jnp.where(causal, 0.0,
                             jnp.float32(-1e9))[None, None]
        for i in range(c.layers):
            x = ClipBlock(c.hidden, c.heads, c.intermediate, c.ln_eps,
                          dtype=self.dtype, name=f"layer{i}")(x, bias)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32,
                         name="final_ln")(x).astype(self.dtype)
        # EOS pooling (HF: position of the eos token id)
        eos_pos = jnp.argmax(
            (input_ids == c.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(
            x, eos_pos[:, None, None], axis=1)[:, 0]
        proj = nn.Dense(c.projection_dim, use_bias=False,
                        dtype=self.dtype, name="text_projection")(pooled)
        proj = proj.astype(jnp.float32)
        return proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)


class ClipVisionTower(nn.Module):
    """images (B, H, W, 3) -> CLS hidden state (B, hidden)
    (pre-post-layernorm, matching the reference's usage)."""

    cfg: ClipVisionCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(c.hidden, (c.patch, c.patch),
                    strides=(c.patch, c.patch), padding="VALID",
                    use_bias=False, dtype=self.dtype,
                    name="patch_embedding")(images.astype(self.dtype))
        x = x.reshape(b, -1, c.hidden)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02),
                         (c.hidden,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None].astype(self.dtype),
                              (b, 1, c.hidden)), x], axis=1)
        n = x.shape[1]
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (n, c.hidden), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32,
                         name="pre_ln")(x).astype(self.dtype)
        bias = jnp.zeros((1, 1, n, n), jnp.float32)
        for i in range(c.layers):
            x = ClipBlock(c.hidden, c.heads, c.intermediate, c.ln_eps,
                          dtype=self.dtype, name=f"layer{i}")(x, bias)
        return x[:, 0]


def _t(w):
    return np.transpose(np.asarray(w))


def _convert_blocks(sd: Dict, prefix: str, layers: int) -> Dict:
    out = {}
    for i in range(layers):
        p = f"{prefix}encoder.layers.{i}."
        out[f"layer{i}"] = {
            "ln1": {"scale": sd[p + "layer_norm1.weight"],
                    "bias": sd[p + "layer_norm1.bias"]},
            "ln2": {"scale": sd[p + "layer_norm2.weight"],
                    "bias": sd[p + "layer_norm2.bias"]},
            "q": {"kernel": _t(sd[p + "self_attn.q_proj.weight"]),
                  "bias": sd[p + "self_attn.q_proj.bias"]},
            "k": {"kernel": _t(sd[p + "self_attn.k_proj.weight"]),
                  "bias": sd[p + "self_attn.k_proj.bias"]},
            "v": {"kernel": _t(sd[p + "self_attn.v_proj.weight"]),
                  "bias": sd[p + "self_attn.v_proj.bias"]},
            "out": {"kernel": _t(sd[p + "self_attn.out_proj.weight"]),
                    "bias": sd[p + "self_attn.out_proj.bias"]},
            "fc1": {"kernel": _t(sd[p + "mlp.fc1.weight"]),
                    "bias": sd[p + "mlp.fc1.bias"]},
            "fc2": {"kernel": _t(sd[p + "mlp.fc2.weight"]),
                    "bias": sd[p + "mlp.fc2.bias"]},
        }
    return out


def convert_clip_text(sd: Dict, cfg: ClipTextCfg,
                      prefix: str = "text_model.") -> Dict:
    params = _convert_blocks(sd, prefix, cfg.layers)
    params.update({
        "token_embedding": {"embedding": np.asarray(
            sd[prefix + "embeddings.token_embedding.weight"])},
        "position_embedding": np.asarray(
            sd[prefix + "embeddings.position_embedding.weight"]),
        "final_ln": {"scale": sd[prefix + "final_layer_norm.weight"],
                     "bias": sd[prefix + "final_layer_norm.bias"]},
        "text_projection": {"kernel": _t(sd["text_projection.weight"])},
    })
    return jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x, np.float32)), params)


def convert_clip_vision(sd: Dict, cfg: ClipVisionCfg,
                        prefix: str = "vision_model.") -> Dict:
    params = _convert_blocks(sd, prefix, cfg.layers)
    params.update({
        "patch_embedding": {"kernel": np.transpose(np.asarray(
            sd[prefix + "embeddings.patch_embedding.weight"]),
            (2, 3, 1, 0))},
        "class_embedding": np.asarray(
            sd[prefix + "embeddings.class_embedding"]),
        "position_embedding": np.asarray(
            sd[prefix + "embeddings.position_embedding.weight"]),
        "pre_ln": {"scale": sd[prefix + "pre_layrnorm.weight"],
                   "bias": sd[prefix + "pre_layrnorm.bias"]},
    })
    return jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x, np.float32)), params)
