"""Qwen3-VL in JAX/flax: ViT with deepstack taps + Qwen3 decoder (MRoPE).

Behavioral spec: the published Qwen3-VL architecture (HF transformers
qwen3_vl modeling, which the reference extends in
wedetect_ref/models/qwen3vl_referring.py):

Vision tower
- patch embed: Conv3d (t=2, p=16) over flattened patches == one matmul
- learned 48x48 pos-embed table, bilinearly interpolated to the grid
- blocks: LN -> full attention with 2-D rotary (row/col freqs over
  head_dim/2, duplicated) -> LN -> MLP (gelu-tanh)
- patch merger (2x2 spatial merge -> LN -> fc1 -> GELU -> fc2) for the
  final output AND one post-shuffle-norm merger per deepstack tap layer

Text tower (Qwen3)
- RMSNorm everywhere (eps 1e-6), per-head-dim q/k RMSNorm, GQA,
  SwiGLU MLP, no biases
- interleaved MRoPE: 3-axis (t,h,w) position ids; frequency lanes
  interleaved [t h w t h w ...] within the first 3*section lanes
- deepstack: visual features from tap layers are ADDED to the hidden
  states after decoder layers 0..n_taps-1 at the visual token span

TPU design: single-image sequences with a STATIC (h, w) patch grid and
static visual-span offset — the REC workload (one image + padded text,
scored in one prefill, no decoding). Batched queries share the image:
the vision tower runs once, the decoder runs over (B, L).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wedetect_tpu.ops.attention import (dot_product_attention,
                                        gqa_attention)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class RefVisionCfg:
    depth: int = 24
    hidden: int = 1024
    heads: int = 16
    intermediate: int = 4096
    patch: int = 16
    temporal_patch: int = 2
    in_ch: int = 3
    merge: int = 2
    out_hidden: int = 2048
    num_pos_emb: int = 2304  # 48 * 48
    deepstack_idx: Tuple[int, ...] = (5, 11, 17)

    @property
    def head_dim(self):
        return self.hidden // self.heads


@dataclasses.dataclass(frozen=True)
class RefTextCfg:
    vocab_size: int = 151936
    hidden: int = 2048
    layers: int = 28
    heads: int = 16
    kv_heads: int = 8
    head_dim: int = 128
    intermediate: int = 6144
    rms_eps: float = 1e-6
    rope_theta: float = 5e6
    mrope_section: Tuple[int, int, int] = (24, 20, 20)


@dataclasses.dataclass(frozen=True)
class RefCfg:
    vision: RefVisionCfg = RefVisionCfg()
    text: RefTextCfg = RefTextCfg()
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    object_token_id: int = 151665
    # dynamic-int8 decoder/ViT matmuls for the compute-bound prefill
    # (inference-only serving mode; ops/int8.py — 2x MXU peak). The
    # generation DECODE path is bandwidth-bound and has its own
    # weight-only int8 mode (models/quant) — the two compose.
    quant_int8: bool = False

    @classmethod
    def from_hf_config(cls, hf) -> "RefCfg":
        """Build from a transformers Qwen3VLConfig."""
        v, t = hf.vision_config, hf.text_config
        return cls(
            vision=RefVisionCfg(
                depth=v.depth, hidden=v.hidden_size,
                heads=v.num_heads, intermediate=v.intermediate_size,
                patch=v.patch_size, temporal_patch=v.temporal_patch_size,
                in_ch=v.in_channels, merge=v.spatial_merge_size,
                out_hidden=v.out_hidden_size,
                num_pos_emb=v.num_position_embeddings,
                deepstack_idx=tuple(v.deepstack_visual_indexes)),
            text=RefTextCfg(
                vocab_size=t.vocab_size, hidden=t.hidden_size,
                layers=t.num_hidden_layers, heads=t.num_attention_heads,
                kv_heads=t.num_key_value_heads,
                head_dim=getattr(t, "head_dim",
                                 t.hidden_size // t.num_attention_heads),
                intermediate=t.intermediate_size,
                rms_eps=t.rms_norm_eps, rope_theta=t.rope_theta,
                mrope_section=tuple(
                    t.rope_scaling["mrope_section"])),
            image_token_id=hf.image_token_id,
            video_token_id=getattr(hf, "video_token_id", 151656),
            vision_start_token_id=hf.vision_start_token_id,
        )


def ref_2b() -> RefCfg:
    """WeDetect-Ref 2B preset (the RefCfg defaults). Real runs derive
    the exact architecture from the HF checkpoint config via
    RefCfg.from_hf_config; presets exist for benchmarks/dry-runs."""
    return RefCfg()


def ref_4b() -> RefCfg:
    """WeDetect-Ref 4B preset: the Qwen3-VL-4B decoder scale
    (hidden 2560, 36 layers, 32 q / 8 kv heads, ffn 9728) over the
    same vision tower with a matching projector width. hidden < 4000
    so the flatten object-projector branch applies
    (reference qwen3vl_referring.py:230-240)."""
    return RefCfg(
        vision=dataclasses.replace(RefVisionCfg(), out_hidden=2560),
        text=RefTextCfg(hidden=2560, layers=36, heads=32, kv_heads=8,
                        head_dim=128, intermediate=9728),
    )


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(self.dtype)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _apply_rope(q, k, cos, sin):
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    cos, sin = cos.astype(jnp.float32), sin.astype(jnp.float32)
    qe = qf * cos + _rotate_half(qf) * sin
    ke = kf * cos + _rotate_half(kf) * sin
    return qe.astype(q.dtype), ke.astype(k.dtype)


# --------------------------------------------------------------- vision


def vision_pos_ids(grid_h: int, grid_w: int, merge: int) -> np.ndarray:
    """(S, 2) (row, col) ids in merge-permuted token order."""
    mh, mw = grid_h // merge, grid_w // merge
    rows = (np.arange(mh)[:, None, None, None] * merge
            + np.arange(merge)[None, None, :, None])
    cols = (np.arange(mw)[None, :, None, None] * merge
            + np.arange(merge)[None, None, None, :])
    rows = np.broadcast_to(rows, (mh, mw, merge, merge)).reshape(-1)
    cols = np.broadcast_to(cols, (mh, mw, merge, merge)).reshape(-1)
    return np.stack([rows, cols], -1)


def vision_pos_interp(grid_h: int, grid_w: int, side: int, merge: int):
    """Static bilinear gather (indices (4, S), weights (4, S)) for the
    learned pos-embed table, in merge-permuted token order."""
    h_idx = np.linspace(0, side - 1, grid_h)
    w_idx = np.linspace(0, side - 1, grid_w)
    hf, wf = h_idx.astype(np.int64), w_idx.astype(np.int64)
    hc = np.clip(hf + 1, None, side - 1)
    wc = np.clip(wf + 1, None, side - 1)
    dh, dw = h_idx - hf, w_idx - wf
    idx = np.stack([
        (hf[:, None] * side + wf[None, :]).reshape(-1),
        (hf[:, None] * side + wc[None, :]).reshape(-1),
        (hc[:, None] * side + wf[None, :]).reshape(-1),
        (hc[:, None] * side + wc[None, :]).reshape(-1),
    ])
    wgt = np.stack([
        ((1 - dh)[:, None] * (1 - dw)[None, :]).reshape(-1),
        ((1 - dh)[:, None] * dw[None, :]).reshape(-1),
        (dh[:, None] * (1 - dw)[None, :]).reshape(-1),
        (dh[:, None] * dw[None, :]).reshape(-1),
    ])
    # permute flat (h*w) order into merge-block token order
    mh, mw = grid_h // merge, grid_w // merge
    perm = (np.arange(grid_h * grid_w)
            .reshape(mh, merge, mw, merge)
            .transpose(0, 2, 1, 3).reshape(-1))
    return idx[:, perm], wgt[:, perm]


class VisionBlock(nn.Module):
    cfg: RefVisionCfg
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    quant: bool = False

    @nn.compact
    def __call__(self, x, cos, sin, valid=None):
        c = self.cfg
        dg = None
        if self.quant:
            from wedetect_tpu.ops.int8 import quant_dot_general
            dg = quant_dot_general
        s, _ = x.shape
        h, d = c.heads, c.head_dim
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * c.hidden, dtype=self.dtype, dot_general=dg,
                       name="qkv")(y)
        q, k, v = (t.reshape(s, h, d)
                   for t in jnp.split(qkv, 3, axis=-1))
        q, k = _apply_rope(q, k, cos[:, None, :], sin[:, None, :])
        o = dot_product_attention(
            q[None], k[None], v[None], causal=False,
            kv_valid=None if valid is None else valid[None],
            sm_scale=1.0 / math.sqrt(d), impl=self.attn_impl)[0]
        o = nn.Dense(c.hidden, dtype=self.dtype, dot_general=dg,
                     name="proj")(o.reshape(s, c.hidden))
        x = x + o
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        y = nn.Dense(c.intermediate, dtype=self.dtype, dot_general=dg,
                     name="fc1")(y)
        y = jax.nn.gelu(y.astype(jnp.float32),
                        approximate=True).astype(self.dtype)
        y = nn.Dense(c.hidden, dtype=self.dtype, dot_general=dg,
                     name="fc2")(y)
        return x + y


class PatchMerger(nn.Module):
    cfg: RefVisionCfg
    postshuffle: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        m2 = c.merge ** 2
        if self.postshuffle:
            x = x.reshape(-1, c.hidden * m2)
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name="norm")(x).astype(self.dtype)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name="norm")(x).astype(self.dtype)
            x = x.reshape(-1, c.hidden * m2)
        x = nn.Dense(c.hidden * m2, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x.astype(jnp.float32),
                        approximate=False).astype(self.dtype)
        return nn.Dense(c.out_hidden, dtype=self.dtype, name="fc2")(x)


class VisionModel(nn.Module):
    """Static grid, grid_t temporal groups (1 = single image).
    patches (grid_t*gh*gw, in_ch*t*p*p) ->
    (merged (grid_t*gh*gw/m^2, out_hidden), deepstack list of same).

    Video: every temporal group shares the same 2-D grid, so the
    learned pos-embeds and the 2-D rotary row/col frequencies tile
    across groups (the published Qwen3-VL vision tower has no temporal
    rope axis; time lives in the text-side MRoPE)."""

    cfg: RefVisionCfg
    grid_h: int = 16
    grid_w: int = 16
    grid_t: int = 1
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    quant: bool = False

    @nn.compact
    def __call__(self, patches, grid_h: Optional[int] = None,
                 grid_w: Optional[int] = None,
                 grid_t: Optional[int] = None):
        """grid_h/grid_w/grid_t override the module attrs per call —
        every parameter is grid-independent (the pos-embed table is a
        fixed side*side grid bilinearly resampled to the call grid),
        so ONE param tree serves sequences mixing image sizes
        (multi-image scoring, models/ref.score_multi)."""
        c = self.cfg
        gh = self.grid_h if grid_h is None else grid_h
        gw = self.grid_w if grid_w is None else grid_w
        gt = self.grid_t if grid_t is None else grid_t
        x = nn.Dense(c.hidden, dtype=self.dtype,
                     name="patch_embed")(patches.astype(self.dtype))
        side = int(c.num_pos_emb ** 0.5)
        idx, wgt = vision_pos_interp(gh, gw, side, c.merge)
        table = self.param("pos_embed", nn.initializers.normal(0.02),
                           (c.num_pos_emb, c.hidden), jnp.float32)
        pos = jnp.einsum("ksd,ks->sd", table[jnp.asarray(idx)],
                         jnp.asarray(wgt, jnp.float32))
        pos = jnp.tile(pos, (gt, 1))
        x = x + pos.astype(self.dtype)

        ids = vision_pos_ids(gh, gw, c.merge)
        ids = np.tile(ids, (gt, 1))
        dim = c.head_dim // 4
        inv = 1.0 / (10000.0 ** (np.arange(0, dim * 2, 2,
                                           dtype=np.float64) / (dim * 2)))
        freqs = np.concatenate([ids[:, 0:1] * inv[None],
                                ids[:, 1:2] * inv[None]], axis=1)
        emb = np.concatenate([freqs, freqs], axis=-1)
        cos = jnp.asarray(np.cos(emb), jnp.float32)
        sin = jnp.asarray(np.sin(emb), jnp.float32)

        # pad the token axis to a flash-tileable multiple of 128; pad
        # rows carry segment id 0 so they never leak into real tokens
        # (exact under the einsum fallback too: -1e9 bias underflows
        # to an exact 0 softmax weight)
        s = gt * gh * gw
        s_pad = -(-s // 128) * 128
        valid = None
        if s_pad != s:
            x = jnp.pad(x, ((0, s_pad - s), (0, 0)))
            cos = jnp.pad(cos, ((0, s_pad - s), (0, 0)))
            sin = jnp.pad(sin, ((0, s_pad - s), (0, 0)))
            valid = (jnp.arange(s_pad) < s).astype(jnp.int32)

        taps = []
        for i in range(c.depth):
            x = VisionBlock(c, dtype=self.dtype,
                            attn_impl=self.attn_impl,
                            quant=self.quant,
                            name=f"block{i}")(x, cos, sin, valid)
            if i in c.deepstack_idx:
                j = c.deepstack_idx.index(i)
                taps.append(PatchMerger(c, postshuffle=True,
                                        dtype=self.dtype,
                                        name=f"deepstack{j}")(x[:s]))
        out = PatchMerger(c, postshuffle=False, dtype=self.dtype,
                          name="merger")(x[:s])
        return out, taps


# ----------------------------------------------------------------- text


def interleaved_mrope_cos_sin(position_ids: jax.Array,
                              cfg: RefTextCfg):
    """position_ids (3, B, L) -> cos/sin (B, L, head_dim)."""
    half = cfg.head_dim // 2
    inv = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim))
    freqs = (position_ids[..., None].astype(jnp.float32)
             * inv[None, None, None, :])            # (3, B, L, half)
    ft = freqs[0]
    lane = jnp.arange(half)
    for axis, offset in ((1, 1), (2, 2)):
        length = cfg.mrope_section[axis] * 3
        sel = (lane % 3 == offset) & (lane < length)
        ft = jnp.where(sel[None, None, :], freqs[axis], ft)
    emb = jnp.concatenate([ft, ft], axis=-1)        # (B, L, head_dim)
    return jnp.cos(emb), jnp.sin(emb)


class TextLayer(nn.Module):
    """One Qwen3 decoder layer.

    prefix_kv: optional (pk, pv) with shape (1, P, kv_heads, head_dim)
    — post-rope KV of a SHARED leading prefix, concatenated before this
    call's own keys (end-aligned causal; see ops/attention). The
    prefix row broadcasts over the batch.
    return_kv: also return this call's own post-rope (k, v) (pre-GQA
    -repeat) for use as a later prefix_kv.
    """

    cfg: RefTextCfg
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    quant: bool = False

    @nn.compact
    def __call__(self, x, cos, sin, kv_valid, prefix_kv=None,
                 return_kv=False):
        c = self.cfg
        dg = None
        if self.quant:
            from wedetect_tpu.ops.int8 import quant_dot_general
            dg = quant_dot_general
        b, l, _ = x.shape
        y = RMSNorm(c.rms_eps, dtype=self.dtype, name="input_ln")(x)
        q = nn.Dense(c.heads * c.head_dim, use_bias=False,
                     dtype=self.dtype, dot_general=dg,
                     name="q_proj")(y)
        k = nn.Dense(c.kv_heads * c.head_dim, use_bias=False,
                     dtype=self.dtype, dot_general=dg,
                     name="k_proj")(y)
        v = nn.Dense(c.kv_heads * c.head_dim, use_bias=False,
                     dtype=self.dtype, dot_general=dg,
                     name="v_proj")(y)
        q = RMSNorm(c.rms_eps, dtype=self.dtype, name="q_norm")(
            q.reshape(b, l, c.heads, c.head_dim))
        k = RMSNorm(c.rms_eps, dtype=self.dtype, name="k_norm")(
            k.reshape(b, l, c.kv_heads, c.head_dim))
        v = v.reshape(b, l, c.kv_heads, c.head_dim)
        q, k = _apply_rope(q, k, cos[:, :, None, :], sin[:, :, None, :])
        own_kv = (k, v)
        if prefix_kv is not None:
            pk, pv = prefix_kv
            k = jnp.concatenate(
                [jnp.broadcast_to(pk, (b,) + pk.shape[1:]), k], axis=1)
            v = jnp.concatenate(
                [jnp.broadcast_to(pv, (b,) + pv.shape[1:]), v], axis=1)
        # grouped-KV dispatch: no jnp.repeat of KV heads — on TPU the
        # native Pallas kernel reads KV once per group, and the
        # rectangular prefix+suffix causal shape runs without dummy
        # query rows (ops/flash_gqa.py)
        o = gqa_attention(
            q, k, v, causal=True, kv_valid=kv_valid,
            sm_scale=1.0 / math.sqrt(c.head_dim), impl=self.attn_impl)
        o = nn.Dense(c.hidden, use_bias=False, dtype=self.dtype,
                     dot_general=dg, name="o_proj")(o.reshape(b, l, -1))
        x = x + o
        y = RMSNorm(c.rms_eps, dtype=self.dtype, name="post_ln")(x)
        gate = nn.Dense(c.intermediate, use_bias=False,
                        dtype=self.dtype, dot_general=dg,
                        name="gate_proj")(y)
        up = nn.Dense(c.intermediate, use_bias=False, dtype=self.dtype,
                      dot_general=dg, name="up_proj")(y)
        y = nn.Dense(c.hidden, use_bias=False, dtype=self.dtype,
                     dot_general=dg,
                     name="down_proj")(jax.nn.silu(gate) * up)
        out = x + y
        return (out, own_kv) if return_kv else out


class TextModel(nn.Module):
    """Decoder over precomputed input embeddings (prefill scoring).

    deepstack_embeds: list of (V, out_hidden) visual features added at
    layers 0..n-1 over the span [visual_start, visual_start+V) of every
    batch row (single shared image).
    """

    cfg: RefTextCfg
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    quant: bool = False

    def setup(self):
        # setattr with the exact historical names ("layer{i}", "norm")
        # so the param tree matches checkpoints and the converters
        c = self.cfg
        for i in range(c.layers):
            setattr(self, f"layer{i}",
                    TextLayer(c, dtype=self.dtype,
                              attn_impl=self.attn_impl,
                              quant=self.quant))
        self.norm = RMSNorm(c.rms_eps, dtype=self.dtype)

    @property
    def _layers(self):
        return [getattr(self, f"layer{i}")
                for i in range(self.cfg.layers)]

    def _inject_deepstack(self, x, ds, visual_start):
        """Add tap features over visual span(s). ds / visual_start may
        be a single (V, D) array + int, or a tuple of arrays + tuple
        of ints for sequences holding SEVERAL images (each image's tap
        lands at its own span — matches the HF masked-scatter over all
        image-token positions)."""
        if not isinstance(ds, (tuple, list)):
            ds, visual_start = (ds,), (visual_start,)
        for d_i, vs_i in zip(ds, visual_start):
            d_i = d_i.astype(self.dtype)
            span = jax.lax.dynamic_slice_in_dim(
                x, vs_i, d_i.shape[0], axis=1)
            x = jax.lax.dynamic_update_slice_in_dim(
                x, span + d_i[None], vs_i, axis=1)
        return x

    def __call__(self, inputs_embeds, position_ids, attention_mask,
                 deepstack_embeds: Optional[Sequence[jax.Array]] = None,
                 visual_start: int = 0):
        c = self.cfg
        cos, sin = interleaved_mrope_cos_sin(position_ids, c)
        kv_valid = attention_mask.astype(jnp.int32)
        x = inputs_embeds.astype(self.dtype)
        for i, layer in enumerate(self._layers):
            x = layer(x, cos, sin, kv_valid)
            if deepstack_embeds is not None and i < len(deepstack_embeds):
                x = self._inject_deepstack(
                    x, deepstack_embeds[i], visual_start)
        return self.norm(x)

    def prefix_pass(self, prefix_embeds, prefix_position_ids,
                    prefix_mask,
                    deepstack_embeds: Optional[
                        Sequence[jax.Array]] = None,
                    visual_start: int = 0,
                    return_hidden: bool = False):
        """Run the (1, P, D) shared prefix through every layer and
        return the per-layer post-rope KV (tuple of (k, v), each
        (1, P, kv_heads, head_dim)) for suffix_pass. return_hidden=True
        additionally returns the final NORMED hidden states (the
        generation prefill needs them to sample the first token)."""
        cos_p, sin_p = interleaved_mrope_cos_sin(prefix_position_ids,
                                                 self.cfg)
        pvalid = prefix_mask.astype(jnp.int32)
        x = prefix_embeds.astype(self.dtype)
        kvs = []
        for i, layer in enumerate(self._layers):
            x, kv = layer(x, cos_p, sin_p, pvalid, return_kv=True)
            kvs.append(kv)
            if deepstack_embeds is not None and i < len(deepstack_embeds):
                x = self._inject_deepstack(
                    x, deepstack_embeds[i], visual_start)
        if return_hidden:
            return tuple(kvs), self.norm(x)
        return tuple(kvs)

    def suffix_pass(self, kvs, suffix_embeds, suffix_position_ids,
                    prefix_mask, suffix_mask):
        """Batched (B, S, D) suffix rows attending to the shared
        prefix KV from prefix_pass. Returns normed hidden states."""
        b = suffix_embeds.shape[0]
        cos_s, sin_s = interleaved_mrope_cos_sin(suffix_position_ids,
                                                 self.cfg)
        pvalid = prefix_mask.astype(jnp.int32)
        full_valid = jnp.concatenate(
            [jnp.broadcast_to(pvalid, (b, pvalid.shape[1])),
             suffix_mask.astype(jnp.int32)], axis=1)
        y = suffix_embeds.astype(self.dtype)
        for i, layer in enumerate(self._layers):
            y = layer(y, cos_s, sin_s, full_valid, prefix_kv=kvs[i])
        return self.norm(y)

    def prefill_split(self, prefix_embeds, suffix_embeds,
                      prefix_position_ids, suffix_position_ids,
                      prefix_mask, suffix_mask,
                      deepstack_embeds: Optional[
                          Sequence[jax.Array]] = None,
                      visual_start: int = 0):
        """Prefix-sharing prefill: the (1, P, D) prefix — shared by
        every query row — runs through the dense layers ONCE; its
        post-rope KV is then broadcast to the (B, S, D) suffix rows,
        which attend to [prefix KV; own causal KV] (end-aligned
        rectangular causal, ops/attention). Numerically identical to
        __call__ on the concatenated (B, P+S) sequences; the dense
        FLOPs drop from B*(P+S) to P + B*S tokens.

        deepstack taps live inside the prefix span (the image is part
        of the prefix), so injection happens in the prefix pass only.
        Layer i's KV is computed from its input — which includes the
        injections applied after layer i-1 — exactly as in the joint
        pass. Returns the normed (B, S, D) suffix hidden states.
        """
        kvs = self.prefix_pass(prefix_embeds, prefix_position_ids,
                               prefix_mask,
                               deepstack_embeds=deepstack_embeds,
                               visual_start=visual_start)
        return self.suffix_pass(kvs, suffix_embeds,
                                suffix_position_ids, prefix_mask,
                                suffix_mask)


class Embedder(nn.Module):
    cfg: RefTextCfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        return nn.Embed(self.cfg.vocab_size, self.cfg.hidden,
                        dtype=self.dtype,
                        name="embed_tokens")(input_ids)


def get_rope_index_single_image(input_ids: np.ndarray,
                                image_token_id: int,
                                grid_h: int, grid_w: int,
                                merge: int) -> np.ndarray:
    """Host-side MRoPE position ids for one sequence with ONE image.

    Matches get_rope_index semantics: text positions advance all three
    axes together; image tokens get (t=0, row, col) grid positions
    offset by the preceding text length; text after the image resumes
    at max+1. Returns (3, L).
    """
    l = len(input_ids)
    pos = np.zeros((3, l), np.int64)
    img = np.nonzero(input_ids == image_token_id)[0]
    if len(img) == 0:
        pos[:] = np.arange(l)
        return pos
    st = int(img[0])
    mh, mw = grid_h // merge, grid_w // merge
    assert len(img) == mh * mw, (len(img), mh, mw)
    pos[:, :st] = np.arange(st)
    rows = np.repeat(np.arange(mh), mw)
    cols = np.tile(np.arange(mw), mh)
    pos[0, st:st + mh * mw] = st
    pos[1, st:st + mh * mw] = st + rows
    pos[2, st:st + mh * mw] = st + cols
    nxt = st + max(mh, mw)
    rest = l - (st + mh * mw)
    pos[:, st + mh * mw:] = nxt + np.arange(rest)
    return pos


def get_rope_index_single_video(input_ids: np.ndarray,
                                video_token_id: int, grid_t: int,
                                grid_h: int, grid_w: int,
                                merge: int) -> np.ndarray:
    """MRoPE ids for ONE contiguous video span: per temporal group the
    (row, col) grid repeats and the t axis advances by one group.

    NOTE: the HF Qwen3-VL processor instead splits a video into
    per-frame vision spans separated by timestamp text (each with
    t=1); this contiguous-span layout is the simpler SFT-data variant
    this repo's ChatSftDataset emits — time still advances on the t
    axis, rows/cols match per frame. Returns (3, L)."""
    l = len(input_ids)
    pos = np.zeros((3, l), np.int64)
    vid = np.nonzero(input_ids == video_token_id)[0]
    if len(vid) == 0:
        pos[:] = np.arange(l)
        return pos
    st = int(vid[0])
    mh, mw = grid_h // merge, grid_w // merge
    n = grid_t * mh * mw
    assert len(vid) == n, (len(vid), grid_t, mh, mw)
    pos[:, :st] = np.arange(st)
    rows = np.tile(np.repeat(np.arange(mh), mw), grid_t)
    cols = np.tile(np.tile(np.arange(mw), mh), grid_t)
    ts = np.repeat(np.arange(grid_t), mh * mw)
    pos[0, st:st + n] = st + ts
    pos[1, st:st + n] = st + rows
    pos[2, st:st + n] = st + cols
    nxt = st + max(grid_t, mh, mw)
    rest = l - (st + n)
    pos[:, st + n:] = nxt + np.arange(rest)
    return pos


def get_rope_index_multi(input_ids: np.ndarray, image_token_id: int,
                         grids: Sequence[Tuple[int, int]],
                         merge: int) -> np.ndarray:
    """Host-side MRoPE position ids for ONE sequence holding SEVERAL
    images (HF get_rope_index semantics generalized from the
    single-image helper above): text positions advance all three axes
    together; the i-th contiguous image-token run gets (t=st, st+row,
    st+col) grid positions where st is the running offset; text after
    each image resumes at st + max(mh_i, mw_i). grids lists each
    image's UNMERGED (grid_h, grid_w) in order of appearance.
    Returns (3, L)."""
    l = len(input_ids)
    pos = np.zeros((3, l), np.int64)
    is_img = input_ids == image_token_id
    # contiguous runs of image tokens, in order
    edges = np.flatnonzero(np.diff(np.concatenate(
        [[0], is_img.view(np.int8), [0]])))
    runs = list(zip(edges[::2], edges[1::2]))
    assert len(runs) == len(grids), (len(runs), len(grids))
    cur = 0     # next text position
    prev_end = 0
    for (st, en), (gh, gw) in zip(runs, grids):
        mh, mw = gh // merge, gw // merge
        assert en - st == mh * mw, (en - st, mh, mw)
        n_text = st - prev_end
        pos[:, prev_end:st] = cur + np.arange(n_text)
        cur += n_text
        pos[0, st:en] = cur
        pos[1, st:en] = cur + np.repeat(np.arange(mh), mw)
        pos[2, st:en] = cur + np.tile(np.arange(mw), mh)
        cur += max(mh, mw)
        prev_end = en
    pos[:, prev_end:] = cur + np.arange(l - prev_end)
    return pos
