"""WeDetect-Ref: Qwen3-VL-based referring-expression proposal scorer.

Behavioral spec: reference
wedetect_ref/models/qwen3vl_referring.py:97-452
(Qwen3VLModelGrounding / Qwen3VLGroundingForConditionalGeneration):

- ViT emits 3 scales: final merged embeds + the last two deepstack
  taps; ConvTranspose up-projections build a stride-8/16/32 pyramid
- proposals are RoI-aligned 7x7 at each scale, channel-concatenated,
  merged, projected (flatten for <=4000 hidden; mean-pool for larger),
  plus a sine embedding of the normalized cxcywh box
- image tokens additionally get a 2-D sine position embedding
  (grid/size + 0.5 — replicated exactly, including the +0.5)
- object features are scattered into the <object> token slots; ONE
  prefill scores every proposal via a binary head (out_proj,
  prior-prob bias init) at the <object> positions
- training loss: sigmoid focal (alpha .25, gamma 2), mean, scaled by
  mean/positive-count (all-reduced across data parallelism)

TPU design: the vision tower runs ONCE per image; queries batch as
(B, L) rows sharing the image (the reference loops one forward per
query — eval.py:1554-1585; batching here is the free win called out in
SURVEY §7.8). All shapes static: patch grid, sequence length, proposal
count are bucketed compile-time constants.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wedetect_tpu.nn.qwen3vl import (Embedder, RefCfg, TextModel,
                                     VisionModel)
from wedetect_tpu.ops.roi_align import roi_align
from wedetect_tpu.ops.sine_embed import box_xyxy_to_cxcywh, sine_embed

Dtype = Any


def pixels_to_patches(pixels: jax.Array, patch: int,
                      temporal_patch: int, merge: int) -> jax.Array:
    """(H, W, 3) uint8 resized pixels -> (gh*gw, 3*T*P*P) f32,
    ON DEVICE — the jnp twin of data/vision_process.image_to_patches'
    normalize+patchify tail (same row order and f32 arithmetic;
    parity pinned in tests/test_ref_api.py).

    Motivation (measured, PERF.md): shipping pre-extracted f32
    patches moves C*T = 6 f32 bytes-per-pixel-channel over the host
    link where the raw image is 1 uint8 byte — an 8x H2D cut. On the
    tunneled bench rig that link is the REC bottleneck; on real TPU
    hosts it still halves PCIe traffic vs f32 pixels. The conversion
    itself is a reshape/transpose XLA fuses into the vision tower's
    first projection.
    """
    from wedetect_tpu.data.vision_process import IMAGE_MEAN, IMAGE_STD

    h, w, _ = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)
    x = x.transpose(2, 0, 1)                      # CHW
    x = jnp.stack([x] * temporal_patch, 0)        # T, C, H, W
    x = x.reshape(temporal_patch, 3, gh // merge, merge, patch,
                  gw // merge, merge, patch)
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    return x.reshape(gh * gw, 3 * temporal_patch * patch * patch)


class Mlp2xGelu(nn.Module):
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out, dtype=self.dtype, name="fc0")(x)
        x = jax.nn.gelu(x.astype(jnp.float32),
                        approximate=False).astype(self.dtype)
        return nn.Dense(self.out, dtype=self.dtype, name="fc1")(x)


class ConvT2x(nn.Module):
    """ConvTranspose2d k=2 s=2 with torch-layout params (in, out, 2, 2)."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (c, self.out_ch, 2, 2), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_ch,), jnp.float32)
        k = kernel.astype(self.dtype).reshape(c, self.out_ch * 4)
        y = jnp.einsum("hwc,ck->hwk", x.astype(self.dtype), k)
        y = y.reshape(h, w, self.out_ch, 2, 2)
        y = y.transpose(0, 3, 1, 4, 2).reshape(h * 2, w * 2, self.out_ch)
        return y + bias.astype(self.dtype)


class GroundingExtras(nn.Module):
    """The reference's added modules around the Qwen3-VL trunk."""

    cfg: RefCfg
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.cfg.text.hidden
        self.image_pos_projector = Mlp2xGelu(d, dtype=self.dtype,
                                             name="image_pos_projector")
        self.object_vision_projector = Mlp2xGelu(
            d, dtype=self.dtype, name="object_vision_projector")
        self.object_pos_projector = Mlp2xGelu(
            d, dtype=self.dtype, name="object_pos_projector")
        self.first_scale_conv1 = ConvT2x(d // 2, dtype=self.dtype,
                                         name="first_scale_conv1")
        self.first_scale_conv2 = ConvT2x(d // 4, dtype=self.dtype,
                                         name="first_scale_conv2")
        self.second_scale_conv = ConvT2x(d // 2, dtype=self.dtype,
                                         name="second_scale_conv")
        self.first_scale_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="first_scale_norm")
        self.merge = nn.Dense(d, dtype=self.dtype, name="merge")
        self.out_proj = nn.Dense(
            1, dtype=jnp.float32,
            bias_init=nn.initializers.constant(
                -float(np.log((1 - 0.01) / 0.01))),
            name="out_proj")

    def first_scale_norm_gelu(self, x):
        return jax.nn.gelu(
            self.first_scale_norm(x).astype(jnp.float32),
            approximate=False).astype(self.dtype)

    def __call__(self):  # parameters materialize via setup
        raise NotImplementedError

    def build_pyramid(self, scale1, scale2, scale3):
        """taps/embeds reshaped (H, W, D) -> stride-8/16/32 maps."""
        s1 = self.first_scale_conv1(scale1)
        s1 = self.first_scale_norm_gelu(s1)
        s1 = self.first_scale_conv2(s1)          # (4H, 4W, D/4)
        s2 = self.second_scale_conv(scale2)       # (2H, 2W, D/2)
        return s1, s2, scale3                     # strides 8/16/32

    def object_feats(self, s1, s2, s3, boxes_32):
        """boxes in the (W*32, H*32) coordinate space -> (N, D)."""
        r1 = roi_align(s1, boxes_32, 7, 1.0 / 8)
        r2 = roi_align(s2, boxes_32, 7, 1.0 / 16)
        r3 = roi_align(s3, boxes_32, 7, 1.0 / 32)
        roi = jnp.concatenate([r1, r2, r3], axis=-1)
        roi = self.merge(roi.astype(self.dtype))          # (N, 7, 7, D)
        d = self.cfg.text.hidden
        if d > 4000:
            roi = roi.reshape(roi.shape[0], 49, d).mean(axis=1)
            roi = self.object_vision_projector(roi)
        else:
            roi = self.object_vision_projector(
                roi.reshape(roi.shape[0], 49 * d))
        h, w, _ = s3.shape
        norm = jnp.asarray([w * 32.0, h * 32.0, w * 32.0, h * 32.0],
                           jnp.float32)
        box_coor = box_xyxy_to_cxcywh(boxes_32) / norm
        pos = self.object_pos_projector(
            sine_embed(box_coor, d).astype(self.dtype))
        return roi + pos

    def image_pos(self, grid_h: int, grid_w: int):
        """Sine pos embeds for the merged image tokens.

        Matches generate_coordinate(...) + 0.5
        (reference qwen3vl_referring.py:143-152, 225-226): x/W + 0.5.
        """
        d = self.cfg.text.hidden
        xs = (np.arange(grid_w, dtype=np.float32) / grid_w) + 0.5
        ys = (np.arange(grid_h, dtype=np.float32) / grid_h) + 0.5
        xx, yy = np.meshgrid(xs, ys)
        coor = jnp.asarray(np.stack([xx.reshape(-1), yy.reshape(-1)],
                                    -1))
        return self.image_pos_projector(
            sine_embed(coor, d).astype(self.dtype))

    def score(self, hidden):
        return self.out_proj(hidden.astype(jnp.float32))[..., 0]


class RefModules(nn.Module):
    """All four trees under one flax module for a single apply()."""

    cfg: RefCfg
    grid_h: int
    grid_w: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    grid_t: int = 1  # >1 only for video SFT samples (train/ref_lm)

    def setup(self):
        self.vision = VisionModel(self.cfg.vision, grid_h=self.grid_h,
                                  grid_w=self.grid_w,
                                  grid_t=self.grid_t, dtype=self.dtype,
                                  attn_impl=self.attn_impl,
                                  quant=self.cfg.quant_int8,
                                  name="vision")
        self.text = TextModel(self.cfg.text, dtype=self.dtype,
                              attn_impl=self.attn_impl,
                              quant=self.cfg.quant_int8,
                              name="text")
        self.embed = Embedder(self.cfg.text, dtype=self.dtype,
                              name="embed")
        self.extras = GroundingExtras(self.cfg, dtype=self.dtype,
                                      name="extras")

    def __call__(self, patches, input_ids, attn_mask, position_ids,
                 boxes_xyxy, ori_wh, visual_start: int,
                 object_positions):
        """Score proposals for a batch of query sequences.

        patches: (S, C*t*p*p) ONE image; input_ids/attn_mask: (B, L);
        position_ids: (3, B, L); boxes_xyxy: (N, 4) in original image
        coords; ori_wh: (2,) (width, height); object_positions: (B, N)
        indices of the <object> slots. Returns (B, N) logits.
        """
        c = self.cfg
        d = c.text.hidden
        # vision + RoI from the first temporal group (grounding is
        # image-only: grid_t == 1 except video SFT, where boxes are
        # dummy); boxes: original -> (W*32, H*32) space
        # (reference qwen3vl_referring.py:217 — ori_shape is (w, h))
        img_tokens, obj, taps = self._vision_and_objects(
            patches, boxes_xyxy, ori_wh)

        x = self.embed(input_ids)                    # (B, L, D)
        b, l, _ = x.shape
        v = img_tokens.shape[0]
        # scatter image tokens at the (shared, static) visual span
        x = jax.lax.dynamic_update_slice_in_dim(
            x, jnp.broadcast_to(img_tokens[None].astype(x.dtype),
                                (b, v, d)),
            visual_start, axis=1)
        # scatter object features at per-row positions; -1 marks
        # padded slots (training pads the proposal axis) — those keep
        # the original token embedding
        bidx = jnp.arange(b)[:, None]
        pos = jnp.clip(object_positions, 0)
        cur = x[bidx, pos]
        newv = jnp.where((object_positions >= 0)[..., None],
                         jnp.broadcast_to(obj[None].astype(x.dtype),
                                          (b,) + obj.shape), cur)
        x = x.at[bidx, pos].set(newv)

        hidden = self.text(x, position_ids, attn_mask,
                           deepstack_embeds=list(taps),
                           visual_start=visual_start)
        logits = self.extras.score(hidden)           # (B, L)
        return jnp.take_along_axis(logits, pos, axis=1)

    def _vision_and_objects(self, patches, boxes_xyxy, ori_wh):
        """Shared front half: vision tower + RoI object features +
        pos-embedded image tokens.

        patches: pre-extracted (S, C*t*p*p) f32 patches, OR raw
        (H, W, 3) uint8 resized pixels — the latter are patchified on
        device (pixels_to_patches), minimizing host->device bytes."""
        c = self.cfg
        if patches.ndim == 3:
            patches = pixels_to_patches(
                patches, c.vision.patch, c.vision.temporal_patch,
                c.vision.merge)
        m = c.vision.merge
        mh, mw = self.grid_h // m, self.grid_w // m
        d = c.text.hidden
        img_embeds, taps = self.vision(patches)
        scale3 = img_embeds[:mh * mw].reshape(mh, mw, d)
        scale2 = taps[-1][:mh * mw].reshape(mh, mw, d)
        scale1 = taps[-2][:mh * mw].reshape(mh, mw, d)
        s1, s2, s3 = self.extras.build_pyramid(scale1, scale2, scale3)
        norm = jnp.asarray([mw * 32.0, mh * 32.0, mw * 32.0, mh * 32.0],
                           jnp.float32)
        ow = jnp.concatenate([ori_wh, ori_wh]).astype(jnp.float32)
        boxes_32 = boxes_xyxy.astype(jnp.float32) / (ow / norm)
        obj = self.extras.object_feats(s1, s2, s3, boxes_32)
        img_tokens = img_embeds + jnp.tile(
            self.extras.image_pos(mh, mw), (self.grid_t, 1))
        return img_tokens, obj, taps

    def _vision_one(self, patches, gh: int, gw: int):
        """One image at a call-time grid (params are grid-independent;
        nn/qwen3vl.VisionModel grid override). Returns (pos-embedded
        img tokens (V, D), taps list, (s1, s2, s3) merged-grid maps)."""
        c = self.cfg
        if patches.ndim == 3:
            patches = pixels_to_patches(
                patches, c.vision.patch, c.vision.temporal_patch,
                c.vision.merge)
        m = c.vision.merge
        mh, mw = gh // m, gw // m
        d = c.text.hidden
        img_embeds, taps = self.vision(patches, grid_h=gh, grid_w=gw,
                                       grid_t=1)
        scale3 = img_embeds.reshape(mh, mw, d)
        scale2 = taps[-1].reshape(mh, mw, d)
        scale1 = taps[-2].reshape(mh, mw, d)
        img_tokens = img_embeds + self.extras.image_pos(mh, mw)
        return img_tokens, taps, (scale1, scale2, scale3)

    def _objects_from(self, scales, boxes_xyxy, ori_wh):
        """RoI object features for boxes on the image whose merged
        grid maps are `scales`."""
        s1, s2, s3 = self.extras.build_pyramid(*scales)
        mh, mw = scales[2].shape[:2]
        norm = jnp.asarray([mw * 32.0, mh * 32.0, mw * 32.0, mh * 32.0],
                           jnp.float32)
        ow = jnp.concatenate([ori_wh, ori_wh]).astype(jnp.float32)
        boxes_32 = boxes_xyxy.astype(jnp.float32) / (ow / norm)
        return self.extras.object_feats(s1, s2, s3, boxes_32)

    def _multi_assembly(self, patches_list, grids, boxes_list,
                        ori_wh_list):
        """Shared per-image loop for every multi-image entry point:
        vision towers at per-image grids, optional RoI object
        features, and the per-layer deepstack regroup. Returns
        (tokens list, ds per-layer tuples, obj (N_total, D) — empty
        (0, D) when no image carries boxes)."""
        tokens, taps_all, objs = [], [], []
        for patches_i, (gh, gw), boxes_i, ori_i in zip(
                patches_list, grids, boxes_list, ori_wh_list):
            img_tokens, taps, scales = self._vision_one(
                patches_i, gh, gw)
            tokens.append(img_tokens)
            taps_all.append(taps)
            if boxes_i is not None:
                objs.append(self._objects_from(scales, boxes_i, ori_i))
        obj = (jnp.concatenate(objs, axis=0) if objs
               else jnp.zeros((0, self.cfg.text.hidden),
                              tokens[0].dtype))
        ds = [tuple(taps[i] for taps in taps_all)
              for i in range(len(taps_all[0]))]
        return tokens, ds, obj

    def _scatter_objects(self, x, obj, object_positions):
        """Write object features into the <object> slots (-1 = padded
        slot keeps the original token embedding). No-op for empty
        obj/positions (caption-only sequences)."""
        if object_positions.shape[1] == 0 or obj.shape[0] == 0:
            return x
        b = x.shape[0]
        bidx = jnp.arange(b)[:, None]
        pos = jnp.clip(object_positions, 0)
        cur = x[bidx, pos]
        newv = jnp.where((object_positions >= 0)[..., None],
                         jnp.broadcast_to(obj[None].astype(x.dtype),
                                          (b,) + obj.shape), cur)
        return x.at[bidx, pos].set(newv)

    def score_multi(self, patches_list, grids, input_ids, attn_mask,
                    position_ids, boxes_list, ori_wh_list,
                    visual_starts, object_positions):
        """Score proposals for sequences holding SEVERAL images.

        The reference forward natively supports this layout
        (qwen3vl_referring.py:186-258: one bboxes/ori_shapes entry per
        IMAGE; object features concatenate across images in order and
        scatter into the <object> slots) even though its eval drivers
        are single-image; this is the TPU twin with static per-image
        grids.

        patches_list: tuple, one (S_i, C*t*p*p) f32 / (H_i, W_i, 3)
        uint8 entry per image; grids: static tuple of UNMERGED
        (gh_i, gw_i); visual_starts: static tuple of span offsets;
        boxes_list: per-image (N_i, 4) original-coordinate boxes or
        None (image contributes no object features); ori_wh_list:
        per-image (2,) (width, height). object_positions: (B, N_total)
        with N_total = sum N_i, indexing <object> slots in image order
        (-1 = padded slot). Returns (B, N_total) logits."""
        tokens, ds, obj = self._multi_assembly(
            patches_list, grids, boxes_list, ori_wh_list)
        x = self.embed(input_ids)                     # (B, L, D)
        b = x.shape[0]
        for tok, vs in zip(tokens, visual_starts):
            x = jax.lax.dynamic_update_slice_in_dim(
                x, jnp.broadcast_to(tok[None].astype(x.dtype),
                                    (b,) + tok.shape), vs, axis=1)
        x = self._scatter_objects(x, obj, object_positions)
        hidden = self.text(x, position_ids, attn_mask,
                           deepstack_embeds=ds,
                           visual_start=tuple(visual_starts))
        logits = self.extras.score(hidden)            # (B, L)
        return jnp.take_along_axis(logits,
                                   jnp.clip(object_positions, 0),
                                   axis=1)

    def prefill_split(self, patches, prefix_ids, suffix_ids,
                      prefix_mask, suffix_mask, prefix_position_ids,
                      suffix_position_ids, boxes_xyxy, ori_wh,
                      visual_start: int, object_positions):
        """Prefix-sharing scoring: the image-bearing prefix (identical
        for every query of one image) runs through the decoder ONCE.

        prefix_ids/prefix_mask: (1, P) shared prefix (chat preamble +
        vision span), right-padded to a flash-tileable P.
        suffix_ids/suffix_mask: (B, S) per-query tails (query text +
        <object> slots), right-padded.
        prefix/suffix_position_ids: (3, 1, P) / (3, B, S) MRoPE ids of
        the CONCATENATED sequence, split at the true prefix length.
        object_positions: (B, N) SUFFIX-relative <object> indices.
        Returns (B, N) logits — identical to __call__ on the joint
        sequences (tests/test_prefix_prefill.py pins this).
        """
        c = self.cfg
        img_tokens, obj, taps = self._vision_and_objects(
            patches, boxes_xyxy, ori_wh)

        xp = self.embed(prefix_ids)                  # (1, P, D)
        xp = jax.lax.dynamic_update_slice_in_dim(
            xp, img_tokens[None].astype(xp.dtype), visual_start, axis=1)

        xs = self.embed(suffix_ids)                  # (B, S, D)
        b = xs.shape[0]
        bidx = jnp.arange(b)[:, None]
        pos = jnp.clip(object_positions, 0)
        cur = xs[bidx, pos]
        newv = jnp.where((object_positions >= 0)[..., None],
                         jnp.broadcast_to(obj[None].astype(xs.dtype),
                                          (b,) + obj.shape), cur)
        xs = xs.at[bidx, pos].set(newv)

        hidden = self.text.prefill_split(
            xp, xs, prefix_position_ids, suffix_position_ids,
            prefix_mask, suffix_mask, deepstack_embeds=list(taps),
            visual_start=visual_start)
        logits = self.extras.score(hidden)           # (B, S)
        return jnp.take_along_axis(logits, pos, axis=1)

    def prefix_stage_multi(self, patches_list, grids, prefix_ids,
                           prefix_mask, prefix_position_ids,
                           boxes_list, ori_wh_list, visual_starts):
        """Multi-image twin of prefix_stage: every image lives in the
        shared prefix, so prefix sharing factors identically — the
        prefix (with ALL vision spans + multi-span deepstack) runs the
        decoder once, per-query suffixes attend its KV. Returns
        (obj (N_total, D), kvs)."""
        tokens, ds, obj = self._multi_assembly(
            patches_list, grids, boxes_list, ori_wh_list)
        xp = self.embed(prefix_ids)                  # (1, P, D)
        for tok, vs in zip(tokens, visual_starts):
            xp = jax.lax.dynamic_update_slice_in_dim(
                xp, tok[None].astype(xp.dtype), vs, axis=1)
        kvs = self.text.prefix_pass(
            xp, prefix_position_ids, prefix_mask,
            deepstack_embeds=ds, visual_start=tuple(visual_starts))
        return obj, kvs

    def prefix_stage(self, patches, prefix_ids, prefix_mask,
                     prefix_position_ids, boxes_xyxy, ori_wh,
                     visual_start: int):
        """Image-level half of the split prefill: vision tower +
        object features + the prefix decoder pass. Returns
        (obj (N, D), kvs tuple) — cacheable per image so many suffix
        batches (e.g. 80 COCO-OVD queries) reuse ONE prefix compute."""
        img_tokens, obj, taps = self._vision_and_objects(
            patches, boxes_xyxy, ori_wh)
        xp = self.embed(prefix_ids)                  # (1, P, D)
        xp = jax.lax.dynamic_update_slice_in_dim(
            xp, img_tokens[None].astype(xp.dtype), visual_start, axis=1)
        kvs = self.text.prefix_pass(
            xp, prefix_position_ids, prefix_mask,
            deepstack_embeds=list(taps), visual_start=visual_start)
        return obj, kvs

    def suffix_stage(self, obj, kvs, suffix_ids, suffix_mask,
                     suffix_position_ids, prefix_mask,
                     object_positions):
        """Per-query-batch half: embed suffixes, scatter the cached
        object features, decode against the cached prefix KV, score.

        obj: (N, D) shared across rows (many queries, one image) or
        (B, N, D) per-row (cross-image REC batching — each row is a
        different image, so kvs/prefix_mask then carry a leading B
        too).
        """
        xs = self.embed(suffix_ids)                  # (B, S, D)
        b = xs.shape[0]
        bidx = jnp.arange(b)[:, None]
        pos = jnp.clip(object_positions, 0)
        cur = xs[bidx, pos]
        objb = (obj[None] if obj.ndim == 2 else obj).astype(xs.dtype)
        newv = jnp.where((object_positions >= 0)[..., None],
                         jnp.broadcast_to(objb,
                                          (b,) + objb.shape[1:]), cur)
        xs = xs.at[bidx, pos].set(newv)
        hidden = self.text.suffix_pass(kvs, xs, suffix_position_ids,
                                       prefix_mask, suffix_mask)
        logits = self.extras.score(hidden)           # (B, S)
        return jnp.take_along_axis(logits, pos, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 8, 12, 13))
def ref_score_step(cfg: RefCfg, grid_h: int, grid_w: int, params,
                   patches, input_ids, attn_mask, position_ids,
                   visual_start: int, boxes_xyxy, ori_wh,
                   object_positions, dtype=jnp.float32,
                   attn_impl: str = "auto"):
    """Jitted REC scoring: (B, N) proposal logits."""
    return RefModules(cfg, grid_h, grid_w, dtype=dtype,
                      attn_impl=attn_impl).apply(
        {"params": params}, patches, input_ids, attn_mask,
        position_ids, boxes_xyxy, ori_wh, visual_start,
        object_positions)


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 11, 12))
def ref_score_step_multi(cfg: RefCfg, grids, params, patches_list,
                         input_ids, attn_mask, position_ids,
                         boxes_list, ori_wh_list, visual_starts,
                         object_positions, dtype=jnp.float32,
                         attn_impl: str = "auto"):
    """Jitted multi-image REC scoring (RefModules.score_multi).
    grids: static tuple of per-image unmerged (gh, gw);
    visual_starts: static tuple of span offsets. (B, N_total) logits."""
    return RefModules(cfg, grids[0][0], grids[0][1], dtype=dtype,
                      attn_impl=attn_impl).apply(
        {"params": params}, tuple(patches_list), tuple(grids),
        input_ids, attn_mask, position_ids, tuple(boxes_list),
        tuple(ori_wh_list), tuple(visual_starts), object_positions,
        method="score_multi")


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10, 11))
def ref_prefix_step_multi(cfg: RefCfg, grids, params, patches_list,
                          prefix_ids, prefix_mask,
                          prefix_position_ids, boxes_list,
                          ori_wh_list, visual_starts,
                          dtype=jnp.float32, attn_impl: str = "auto"):
    """Jitted multi-image image-level stage: (obj, kvs) for
    ref_suffix_step — all images' vision + RoI + the joint prefix
    computed once, reused across query batches."""
    return RefModules(cfg, grids[0][0], grids[0][1], dtype=dtype,
                      attn_impl=attn_impl).apply(
        {"params": params}, tuple(patches_list), tuple(grids),
        prefix_ids, prefix_mask, prefix_position_ids,
        tuple(boxes_list), tuple(ori_wh_list), tuple(visual_starts),
        method="prefix_stage_multi")


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 10, 11, 12))
def ref_prefix_step(cfg: RefCfg, grid_h: int, grid_w: int, params,
                    patches, prefix_ids, prefix_mask,
                    prefix_position_ids, boxes_xyxy, ori_wh,
                    visual_start: int, dtype=jnp.float32,
                    attn_impl: str = "auto"):
    """Jitted image-level stage: returns (obj, kvs) device values for
    ref_suffix_step — compute once per image, reuse across query
    batches."""
    mod = RefModules(cfg, grid_h, grid_w, dtype=dtype,
                     attn_impl=attn_impl)
    return mod.apply(
        {"params": params}, patches, prefix_ids, prefix_mask,
        prefix_position_ids, boxes_xyxy, ori_wh, visual_start,
        method="prefix_stage")


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 11, 12))
def ref_suffix_step(cfg: RefCfg, grid_h: int, grid_w: int, params,
                    obj, kvs, suffix_ids, suffix_mask,
                    suffix_position_ids, prefix_mask,
                    object_positions, dtype=jnp.float32,
                    attn_impl: str = "auto"):
    """Jitted per-query-batch stage against cached (obj, kvs)."""
    mod = RefModules(cfg, grid_h, grid_w, dtype=dtype,
                     attn_impl=attn_impl)
    return mod.apply(
        {"params": params}, obj, kvs, suffix_ids, suffix_mask,
        suffix_position_ids, prefix_mask, object_positions,
        method="suffix_stage")


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 10, 11, 12))
def ref_rec_batch_step(cfg: RefCfg, grid_h: int, grid_w: int, params,
                       patches, prefix_ids, prefix_mask,
                       prefix_position_ids, boxes_xyxy, ori_wh,
                       visual_start: int, dtype=jnp.float32,
                       attn_impl: str = "auto", suffix_ids=None,
                       suffix_mask=None, suffix_position_ids=None,
                       object_positions=None):
    """Cross-image REC batching: B images (same grid bucket), ONE
    query row per image, one fused step.

    patches (B, S_patch, Dp); prefix_ids/prefix_mask (B, P) — the
    token layout is identical per image but kept per-row for
    generality; boxes (B, N, 4); ori_wh (B, 2); suffix_* (B, S).
    The vision towers + prefix passes run vmapped over images, then
    one suffix pass where row i attends image i's KV. Returns (B, N).

    This is the refcoco-style workload (the reference's 6.6 FPS is
    one query per forward on exactly this protocol); the many-query
    path (ref_prefix_step + ref_suffix_step) covers OVD/HumanRef.
    """
    mod = RefModules(cfg, grid_h, grid_w, dtype=dtype,
                     attn_impl=attn_impl)

    def one_prefix(patches_i, pids_i, pmask_i, ppos_i, boxes_i, ori_i):
        return mod.apply(
            {"params": params}, patches_i, pids_i, pmask_i, ppos_i,
            boxes_i, ori_i, visual_start, method="prefix_stage")

    obj, kvs = jax.vmap(one_prefix)(
        patches, prefix_ids[:, None], prefix_mask[:, None],
        prefix_position_ids, boxes_xyxy, ori_wh)
    # vmapped prefix outputs carry (B, 1, ...) from the inner
    # singleton row; squeeze to per-row (B, P, kv_heads, head_dim)
    kvs = jax.tree.map(lambda t: t[:, 0], kvs)
    return mod.apply(
        {"params": params}, obj, kvs, suffix_ids, suffix_mask,
        suffix_position_ids, prefix_mask, object_positions,
        method="suffix_stage")


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 12, 15, 16))
def ref_score_step_split(cfg: RefCfg, grid_h: int, grid_w: int, params,
                         patches, prefix_ids, suffix_ids, prefix_mask,
                         suffix_mask, prefix_position_ids,
                         suffix_position_ids, boxes_xyxy,
                         visual_start: int, ori_wh, object_positions,
                         dtype=jnp.float32, attn_impl: str = "auto"):
    """Jitted prefix-sharing REC scoring (see RefModules.prefill_split):
    the shared image prefix runs the decoder once; only the per-query
    suffixes run batched. (B, N) proposal logits."""
    mod = RefModules(cfg, grid_h, grid_w, dtype=dtype,
                     attn_impl=attn_impl)
    return mod.apply(
        {"params": params}, patches, prefix_ids, suffix_ids,
        prefix_mask, suffix_mask, prefix_position_ids,
        suffix_position_ids, boxes_xyxy, ori_wh, visual_start,
        object_positions, method="prefill_split")


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                       alpha: float = 0.25, gamma: float = 2.0,
                       valid: Optional[jax.Array] = None) -> jax.Array:
    """Reference qwen3vl_referring.py:69-91: alpha-weighted focal
    terms, MEAN-reduced. (The reference computes an all-reduced
    positive count at the call site — :440-445 — but its focal
    function ignores that argument and returns the plain mean;
    replicated faithfully.) `valid` masks static-shape padding; the
    mean runs over valid elements only (equal to the reference's mean
    over its dynamic-length tensor)."""
    p = jax.nn.sigmoid(logits)
    ce = (jnp.maximum(logits, 0) - logits * targets
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * loss
    if valid is None:
        return loss.mean()
    v = valid.astype(loss.dtype)
    return (loss * v).sum() / jnp.maximum(v.sum(), 1.0)
