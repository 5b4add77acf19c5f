"""XLM-RoBERTa text tower (flax.linen).

Behavioral spec: reference
wedetect/models/backbones/mm_backbone.py:342-421
(XLMRobertaLanguageBackbone): HF XLMRobertaModel -> CLS hidden state ->
Linear head (hidden -> 768) -> L2 normalize -> reshape (B, K, 768).

The transformer is the standard RoBERTa encoder (post-LN), re-derived
from the published architecture (HF config.json shipped with the
reference at xlm-roberta-base/config.json): learned position embeddings
offset by padding_idx (position id = cumulative non-pad count +
pad_token_id), GELU FFN, per-layer post-attention/post-FFN LayerNorm.

TPU notes: runs as its own jitted fn over a (N, L) padded token batch —
the text bank is encoded ONCE per class set ("reparameterize",
reference yolo_world.py:58-61) and cached as a (K, 768) constant input
to the detect graph. Tokenization happens on host
(`wedetect_tpu.data.tokenizer`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wedetect_tpu.configs import TextCfg

Dtype = Any


class SelfAttention(nn.Module):
    cfg: TextCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.cfg
        h, d = c.num_heads, c.hidden_size // c.num_heads
        qkv = [nn.Dense(c.hidden_size, dtype=self.dtype, name=n)(x)
               for n in ("query", "key", "value")]
        q, k, v = (t.reshape(*t.shape[:-1], h, d).transpose(0, 2, 1, 3)
                   for t in qkv)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        scores = scores.astype(jnp.float32) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(*x.shape)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out")(ctx)


class EncoderLayer(nn.Module):
    cfg: TextCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.cfg
        a = SelfAttention(c, dtype=self.dtype, name="attention")(
            x, mask_bias)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="attention_ln")(x + a).astype(self.dtype)
        f = nn.Dense(c.intermediate_size, dtype=self.dtype,
                     name="intermediate")(x)
        f = jax.nn.gelu(f.astype(jnp.float32),
                        approximate=False).astype(self.dtype)
        f = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(f)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="output_ln")(x + f).astype(self.dtype)
        return x


class XLMRobertaEncoder(nn.Module):
    """input_ids (N, L) int32 + attention_mask (N, L) -> (N, L, H)."""

    cfg: TextCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        c = self.cfg
        we = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                      name="word_embeddings")(input_ids)
        # RoBERTa position ids: cumulative non-pad count + pad_token_id
        mask = attention_mask.astype(jnp.int32)
        pos_ids = jnp.cumsum(mask, axis=-1) * mask + c.pad_token_id
        pe = nn.Embed(c.max_position_embeddings, c.hidden_size,
                      dtype=self.dtype, name="position_embeddings")(pos_ids)
        te = self.param("token_type_embeddings",
                        nn.initializers.normal(0.02),
                        (c.type_vocab_size, c.hidden_size), jnp.float32)
        x = we + pe + te[0].astype(self.dtype)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="embeddings_ln")(x).astype(self.dtype)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                         jnp.float32(-1e9))
        for i in range(c.num_layers):
            x = EncoderLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                x, bias)
        return x


class TextTower(nn.Module):
    """Full text tower: encoder -> CLS -> head Linear -> L2 norm."""

    cfg: TextCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        x = XLMRobertaEncoder(self.cfg, dtype=self.dtype,
                              name="encoder")(input_ids, attention_mask)
        cls = x[:, 0]
        out = nn.Dense(self.cfg.head_out, dtype=self.dtype,
                       name="head")(cls)
        out = out.astype(jnp.float32)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def convert_hf_text_tower(sd: Dict[str, np.ndarray],
                          cfg: TextCfg,
                          prefix: str = "") -> Dict:
    """HF XLMRobertaModel torch state dict -> TextTower flax params.

    `sd` keys are e.g. `embeddings.word_embeddings.weight`,
    `encoder.layer.0.attention.self.query.weight`. The detector
    checkpoint stores them under `backbone.text_model.model.` with the
    head at `backbone.text_model.head.` (reference:
    eval_retrieval/extract_embedding.py:1293-1304); pass that as prefix
    after stripping.
    """
    t = lambda w: np.transpose(w)  # noqa: E731
    g = lambda k: np.asarray(sd[prefix + k])  # noqa: E731
    enc: Dict = {
        "word_embeddings": {
            "embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": g("embeddings.position_embeddings.weight")},
        "token_type_embeddings":
            g("embeddings.token_type_embeddings.weight"),
        "embeddings_ln": {"scale": g("embeddings.LayerNorm.weight"),
                          "bias": g("embeddings.LayerNorm.bias")},
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        enc[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": t(g(p + "attention.self.query.weight")),
                          "bias": g(p + "attention.self.query.bias")},
                "key": {"kernel": t(g(p + "attention.self.key.weight")),
                        "bias": g(p + "attention.self.key.bias")},
                "value": {"kernel": t(g(p + "attention.self.value.weight")),
                          "bias": g(p + "attention.self.value.bias")},
                "out": {"kernel": t(g(p + "attention.output.dense.weight")),
                        "bias": g(p + "attention.output.dense.bias")},
            },
            "attention_ln": {
                "scale": g(p + "attention.output.LayerNorm.weight"),
                "bias": g(p + "attention.output.LayerNorm.bias")},
            "intermediate": {
                "kernel": t(g(p + "intermediate.dense.weight")),
                "bias": g(p + "intermediate.dense.bias")},
            "output": {"kernel": t(g(p + "output.dense.weight")),
                       "bias": g(p + "output.dense.bias")},
            "output_ln": {"scale": g(p + "output.LayerNorm.weight"),
                          "bias": g(p + "output.LayerNorm.bias")},
        }
    params = {"encoder": enc}
    if prefix + "head.weight" in sd or "head.weight" in sd:
        hp = prefix if prefix + "head.weight" in sd else ""
        params["head"] = {
            "kernel": t(np.asarray(sd[hp + "head.weight"])),
            "bias": np.asarray(sd[hp + "head.bias"])}
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)),
                        params)
