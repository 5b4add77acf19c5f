"""WeDetect head: conv towers + BN-contrastive scoring + DFL regression.

Behavioral spec: reference generate_proposal.py:586-752 and
wedetect/models/dense_heads/yolo_world_head.py:137-294 —
per pyramid level:
  cls tower  : 2x ConvBN(256, 3x3, SiLU) -> 1x1 conv -> region embedding
               (embed_dims, default 768)
  contrastive: BatchNorm(embed) . L2norm(text)^T * e^logit_scale + bias
  reg tower  : 2x ConvBN(64, 3x3, SiLU) -> 1x1 conv -> 4*reg_max DFL
               logits -> expectation decode -> (l, t, r, b) distances

TPU notes: the per-level contrastive einsum 'bchw,bkc->bkhw' becomes an
NHWC (B*H*W, C) x (C, K) matmul — directly MXU-shaped. All levels are
flattened to the anchor axis (B, A, ...) at the end so downstream
decode/NMS/assign run on one fused tensor.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

import numpy as np

from wedetect_tpu.nn.layers import ConvBN, Conv1x1
from wedetect_tpu.ops.dfl import dfl_expectation

Dtype = Any


def bn_fold_scale_bias(scale, bias, mean, var, eps: float = 1e-3):
    """Inference BatchNorm as an affine (k, b): y = k*x + b."""
    k = scale / jnp.sqrt(var + eps)
    return k, bias - mean * k


class HeadOutputs(NamedTuple):
    """Flattened head outputs over all levels (anchor axis A)."""

    logits: jax.Array        # (B, A, K) pre-sigmoid class logits
    dists: jax.Array         # (B, A, 4) decoded DFL distances (feat units)
    embeds: jax.Array        # (B, A, C) post-BN region embeddings
    dist_logits: jax.Array   # (B, A, 4, reg_max) raw DFL logits


class ContrastiveScore(nn.Module):
    """BN on region embeddings + similarity vs text/prompt bank.

    Reference behavior: BNContrastiveHead
    (generate_proposal.py:586-623). `normalize_w=False` reproduces the
    Uni path (generate_proposal.py:1129-1131) where the learned prompt
    bank is used raw.
    """

    embed_dims: int
    use_bn: bool = True
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, w, train: bool = False,
                 normalize_w: bool = True):
        """x: (B, H, W, C) embeddings; w: (K, C) or (B, K, C) weights.

        Returns (logits (B, H, W, K), normed_x (B, H, W, C)).

        use_bn=False reproduces the plain ContrastiveHead (reference
        yolo_world_head.py:27-65): L2-normalized region embeddings and
        logit_scale initialized to log(1/0.07).
        """
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97, epsilon=1e-3,
                axis_name=self.bn_axis_name if train else None,
                dtype=jnp.float32, name="norm",
            )(x).astype(self.dtype)
        else:
            x = (x * jax.lax.rsqrt(
                jnp.sum(jnp.square(x.astype(jnp.float32)), -1,
                        keepdims=True) + 1e-24)).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (), jnp.float32)
        logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(
                -1.0 if self.use_bn else float(np.log(1 / 0.07))),
            (), jnp.float32)
        if normalize_w:
            w = w * jax.lax.rsqrt(
                jnp.sum(jnp.square(w.astype(jnp.float32)), -1,
                        keepdims=True) + 1e-24).astype(w.dtype)
        w = w.astype(self.dtype)
        if w.ndim == 2:
            sim = jnp.einsum("bhwc,kc->bhwk", x, w)
        else:
            sim = jnp.einsum("bhwc,bkc->bhwk", x, w)
        logits = (sim.astype(jnp.float32) * jnp.exp(logit_scale) + bias)
        return logits, x


class WeDetectHead(nn.Module):
    """Multi-level head. Levels share structure, not weights."""

    embed_dims: int = 768
    num_levels: int = 3
    reg_max: int = 16
    cls_hidden: int = 256
    reg_hidden: int = 64
    use_bn_head: bool = True
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant: bool = False  # int8 tower convs (inference only)

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], w: jax.Array,
                 train: bool = False,
                 normalize_w: bool = True) -> HeadOutputs:
        assert len(feats) == self.num_levels
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        # tower convs may quantize; the 1x1 preds and the contrastive
        # similarity stay float (score-critical, <1 ms — PERF.md)
        tkw = dict(kw, quant=self.quant)
        logits_l, dists_l, embeds_l, dl_l = [], [], [], []
        for i, f in enumerate(feats):
            b, h, wd, _ = f.shape
            c = ConvBN(self.cls_hidden, 3, 1, "silu",
                       bn_eps=1e-3, bn_momentum=0.97,
                       name=f"cls{i}_conv0", **tkw)(f, train)
            c = ConvBN(self.cls_hidden, 3, 1, "silu",
                       bn_eps=1e-3, bn_momentum=0.97,
                       name=f"cls{i}_conv1", **tkw)(c, train)
            embed = Conv1x1(self.embed_dims, dtype=self.dtype,
                            name=f"cls{i}_pred")(c)
            logit, embed_n = ContrastiveScore(
                self.embed_dims, use_bn=self.use_bn_head,
                name=f"contrast{i}", **kw)(embed, w, train,
                                           normalize_w)

            r = ConvBN(self.reg_hidden, 3, 1, "silu",
                       bn_eps=1e-3, bn_momentum=0.97,
                       name=f"reg{i}_conv0", **tkw)(f, train)
            r = ConvBN(self.reg_hidden, 3, 1, "silu",
                       bn_eps=1e-3, bn_momentum=0.97,
                       name=f"reg{i}_conv1", **tkw)(r, train)
            dist_logits = Conv1x1(4 * self.reg_max, dtype=self.dtype,
                                  name=f"reg{i}_pred")(r)
            dist = dfl_expectation(dist_logits, self.reg_max)

            a = h * wd
            logits_l.append(logit.reshape(b, a, -1))
            dists_l.append(dist.reshape(b, a, 4))
            embeds_l.append(embed_n.reshape(b, a, self.embed_dims))
            dl_l.append(dist_logits.reshape(b, a, 4, self.reg_max))
        return HeadOutputs(
            logits=jnp.concatenate(logits_l, axis=1),
            dists=jnp.concatenate(dists_l, axis=1),
            embeds=jnp.concatenate(embeds_l, axis=1),
            dist_logits=jnp.concatenate(dl_l, axis=1),
        )
