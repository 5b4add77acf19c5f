"""Inference-time Conv+BN folding (the 'deploy' / Rep fusion pass).

Behavioral spec: the reference's switch_to_deploy/forward_fuse idea
(yolo_world_pafpn.py:316-333, ConvModule_torch.forward_fuse) and the
Rep* heads that bake normalization into conv weights.

TPU note: XLA already fuses the inference-BN affine into the conv
epilogue, so this is mostly about checkpoint-format parity and about
removing the separate BN statistics from the tree. The fold keeps the
tree structure identical — the conv kernel absorbs scale/rsqrt(var+eps)
and the BN slots become the neutral affine carrying the folded bias:

    y = conv(x) * 1 + b'   with b' = bias - mean * scale / sqrt(var+eps)

so the existing (non-deploy) modules run the fused checkpoint
unchanged and bit-identically.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

# BN epsilons by tree location: head towers + contrastive norms use
# 1e-3 (torch momentum 0.03 convention), neck bricks use the torch
# default 1e-5 (see nn/layers.py docstring).
HEAD_EPS = 1e-3
NECK_EPS = 1e-5


def _eps_for(path: Tuple[str, ...]) -> float:
    return HEAD_EPS if path and path[0] == "head" else NECK_EPS


def fold_conv_bn(variables: Dict) -> Dict:
    """Return variables with every conv+bn pair folded."""
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x, variables["params"])  # copy
    stats = jax.tree.map(lambda x: x, variables.get("batch_stats", {}))

    def walk(p_sub: Any, s_sub: Any, path: Tuple[str, ...]):
        if not isinstance(p_sub, dict):
            return
        if ("conv" in p_sub and "bn" in p_sub
                and isinstance(s_sub, dict) and "bn" in s_sub):
            eps = _eps_for(path)
            scale = p_sub["bn"]["scale"]
            bias = p_sub["bn"]["bias"]
            mean = s_sub["bn"]["mean"]
            var = s_sub["bn"]["var"]
            k = scale * jax.lax.rsqrt(var + eps)
            p_sub["conv"]["kernel"] = (
                p_sub["conv"]["kernel"] * k[None, None, None, :])
            p_sub["bn"] = {"scale": jnp.ones_like(scale),
                           "bias": bias - mean * k}
            s_sub["bn"] = {"mean": jnp.zeros_like(mean),
                           "var": jnp.full_like(var, 1.0 - eps)}
            return
        for key, child in p_sub.items():
            if isinstance(child, dict):
                walk(child, s_sub.get(key, {})
                     if isinstance(s_sub, dict) else {}, path + (key,))

    walk(params, stats, ())
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def bake_text_head(variables: Dict, text_embeds,
                   normalize: bool = True):
    """Bake BN + text bank into per-level 1x1-conv weights.

    The reparameterized RepBNContrastiveHead form (reference
    yolo_world_head.py:112-134 + reparameterize): at inference the
    contrastive scoring  sigmoid_logits = BN(e) . L2norm(T)^T * e^s + b
    collapses into  e @ W^T + c  with
        W = e^s * L2norm(T) * bn_k      (K, C)
        c = e^s * L2norm(T) @ bn_b + b  (K,)
    Returns {level: {"weight": (K, C), "bias": (K,)}} for scoring raw
    (pre-BN) region embeddings.
    """
    import jax.numpy as jnp
    import numpy as np

    t = jnp.asarray(np.asarray(text_embeds, np.float32))
    if normalize:
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    head = variables["params"]["head"]
    stats = variables["batch_stats"]["head"]
    out = {}
    for name, p in head.items():
        if not name.startswith("contrast"):
            continue
        s = stats[name]["norm"]
        k = p["norm"]["scale"] * jax.lax.rsqrt(s["var"] + HEAD_EPS)
        shift = p["norm"]["bias"] - s["mean"] * k
        es = jnp.exp(p["logit_scale"])
        weight = es * t * k[None, :]
        bias = es * (t @ shift) + p["bias"]
        out[name] = {"weight": weight, "bias": bias}
    return out
