"""High-level WeDetect-Ref scorer: image + proposals + queries -> scores.

The user-facing equivalent of the reference's
infer_wedetect_ref.py:53-131 / eval_grounding/eval.py:1540-1623 flow,
re-designed for TPU: queries are batched into ONE prefill per bucket
instead of one forward per query, and all shapes (patch grid, sequence
length, proposal count) are padded to buckets so the jit cache stays
small.

The chat layout replicates the Qwen conversation the reference builds
(user: image + 'Please detect the "<query>" in the image';
assistant: "<object>" * N).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from wedetect_tpu.nn.qwen3vl import RefCfg, get_rope_index_single_image

QUERY_TEMPLATE = 'Please detect the "%s" in the image'


def _drain_rec(out, fut, rows):
    logits = np.asarray(fut)
    for i, s in enumerate(rows):
        out[s["idx"]] = 1.0 / (1.0 + np.exp(-logits[i, :s["n"]]))


def pad_to_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n  # beyond the largest bucket: use the exact length


@dataclasses.dataclass
class RefScorer:
    cfg: RefCfg
    params: Dict
    tokenizer: object = None           # HF tokenizer (optional)
    seq_buckets: Tuple[int, ...] = (512, 1024, 2048, 4096)
    query_batch: int = 8
    max_proposals: int = 100
    # snap images to a fixed grid set -> one prefill compile per
    # bucket instead of per image resolution (None = exact
    # smart_resize grids)
    grid_buckets: Optional[Tuple[Tuple[int, int], ...]] = None
    dtype: str = "float32"                 # "bfloat16" for deployment
    attn_impl: str = "auto"                # flash on TPU by default
    # prefix sharing: the image-bearing prefix (identical for every
    # query of one image) runs the decoder ONCE; per-query suffixes
    # attend to its KV. Identical logits, far fewer dense FLOPs.
    prefix_sharing: bool = True
    suffix_buckets: Tuple[int, ...] = (128, 256, 512, 1024)
    # patchify on device: the host ships resized uint8 pixels and the
    # jitted step runs normalize+patchify (models/ref.pixels_to_patches)
    # — 8x fewer host->device bytes than pre-extracted f32 patches
    # (6 f32 values per pixel channel vs 1 byte), identical numbers
    device_patchify: bool = True
    # max in-flight dispatched batches before readbacks start: deep
    # enough to hide transport round trips, bounded so long runs don't
    # queue unbounded device input buffers
    dispatch_window: int = 4
    # weight-only quantization for the generation decode step
    # (models/quant): the HBM-bound per-token decode reads int8
    # (True or "int8": per-channel scales) or packed int4 ("int4":
    # rank-1 two-sided scales — lossier; validate per checkpoint)
    # kernels instead of full-precision, cutting weight traffic per
    # generated token 2x/4x vs bf16; prefill/scoring stay full
    # precision
    quantize_decode: object = False
    # dynamic int8 for the compute-bound PREFILL/scoring matmuls
    # (decoder + ViT; ops/int8.py via RefCfg.quant_int8) — independent
    # of quantize_decode and composable with it
    quant_prefill: bool = False
    _decode_params: object = dataclasses.field(
        default=None, init=False, repr=False)

    def __post_init__(self):
        if self.quant_prefill and not self.cfg.quant_int8:
            self.cfg = dataclasses.replace(self.cfg, quant_int8=True)
        # fail LOUDLY at construction on a mis-sized bucket: a kv
        # length that the flash kernels cannot tile would silently
        # drop every prefill to the O(L^2)-memory einsum path.
        # Only enforced where flash is reachable (TPU backend or
        # explicit impl) — CPU test configs use tiny exact buckets.
        import jax

        from wedetect_tpu.ops.attention import is_flash_tileable

        if (self.attn_impl == "einsum"
                or (self.attn_impl == "auto"
                    and jax.default_backend() != "tpu")):
            return
        for name, buckets in (("seq_buckets", self.seq_buckets),
                              ("suffix_buckets", self.suffix_buckets)):
            bad = [b for b in buckets if not is_flash_tileable(b)]
            if bad:
                raise ValueError(
                    f"{name} {bad} not tileable for flash attention "
                    "(each bucket must be a multiple of 128)")

    def build_prefix(self, n_img: int) -> np.ndarray:
        """Shared token prefix: chat preamble + vision span."""
        c = self.cfg
        tok = self.tokenizer
        assert tok is not None, "tokenizer required to build sequences"
        pre = tok.encode("<|im_start|>user\n", add_special_tokens=False)
        vs = [c.vision_start_token_id]
        img = [c.image_token_id] * n_img
        ve = tok.encode("<|vision_end|>", add_special_tokens=False)
        return np.array(pre + vs + img + ve, np.int32)

    def build_suffix(self, query: str, n_obj: int) -> np.ndarray:
        """Per-query tail: query text + <object> slots."""
        c = self.cfg
        tok = self.tokenizer
        assert tok is not None, "tokenizer required to build sequences"
        q = tok.encode(QUERY_TEMPLATE % query,
                       add_special_tokens=False)
        mid = tok.encode("<|im_end|>\n<|im_start|>assistant\n",
                         add_special_tokens=False)
        obj = [c.object_token_id] * n_obj
        end = tok.encode("<|im_end|>\n", add_special_tokens=False)
        return np.array(q + mid + obj + end, np.int32)

    def build_sequence(self, query: str, n_img: int, n_obj: int
                       ) -> np.ndarray:
        """Token ids for one chat with the image/object spans."""
        return np.concatenate([self.build_prefix(n_img),
                               self.build_suffix(query, n_obj)])

    def build_prefix_multi(self, n_imgs: Sequence[int]) -> np.ndarray:
        """Chat preamble + SEVERAL vision spans (one per image)."""
        c = self.cfg
        tok = self.tokenizer
        assert tok is not None, "tokenizer required to build sequences"
        parts = [tok.encode("<|im_start|>user\n",
                            add_special_tokens=False)]
        ve = tok.encode("<|vision_end|>", add_special_tokens=False)
        for n in n_imgs:
            parts += [[c.vision_start_token_id],
                      [c.image_token_id] * n, ve]
        return np.array([t for p in parts for t in p], np.int32)

    def _prep_patches(self, image: np.ndarray):
        """Host vision preprocessing: resize (PIL-bicubic parity),
        then either host patchify or — the device_patchify default —
        return the resized uint8 pixels for on-device patchify."""
        from wedetect_tpu.data.vision_process import (image_to_patches,
                                                      image_to_pixels)

        c = self.cfg
        if self.device_patchify:
            return image_to_pixels(
                image, patch=c.vision.patch, merge=c.vision.merge,
                grid_buckets=self.grid_buckets)
        return image_to_patches(
            image, patch=c.vision.patch,
            temporal_patch=c.vision.temporal_patch,
            merge=c.vision.merge, grid_buckets=self.grid_buckets)

    def score(self, image: np.ndarray, proposals: np.ndarray,
              queries: Sequence[str],
              pad_token_id: int = 151643) -> np.ndarray:
        """image HWC uint8 RGB; proposals (N, 4) xyxy in image coords;
        returns (num_queries, N) sigmoid scores."""
        import jax.numpy as jnp

        from wedetect_tpu.models.ref import ref_score_step

        c = self.cfg
        h, w = image.shape[:2]
        # static proposal count: the (expensive) prefill graph must
        # not recompile per proposal count
        proposals, n = self._prep_proposals(proposals, w, h)
        n_pad = self.max_proposals

        patches, gh, gw = self._prep_patches(image)
        n_img = (gh // c.vision.merge) * (gw // c.vision.merge)

        if self.prefix_sharing:
            return self._score_split(patches, gh, gw, proposals, n,
                                     n_pad, n_img, queries, w, h,
                                     pad_token_id)

        seqs = [self.build_sequence(q, n_img, n_pad) for q in queries]
        max_len = max(len(s) for s in seqs)
        l = pad_to_bucket(max_len, self.seq_buckets)
        ids = np.full((len(seqs), l), pad_token_id, np.int32)
        mask = np.zeros((len(seqs), l), np.int32)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        visual_start = int(np.nonzero(seqs[0] == c.image_token_id)[0][0])
        obj_pos = np.stack([
            np.nonzero(s == c.object_token_id)[0][:n_pad]
            for s in seqs]).astype(np.int32)
        pos = np.stack([
            np.pad(get_rope_index_single_image(
                s, c.image_token_id, gh, gw, c.vision.merge),
                ((0, 0), (0, l - len(s))))
            for s in seqs], axis=1)                  # (3, Q, L)

        out = self._dispatch_batches(
            len(seqs), n_pad, ids, mask, pos, obj_pos,
            lambda idsb, maskb, posb, objb: ref_score_step(
                c, gh, gw, self.params, jnp.asarray(patches),
                jnp.asarray(idsb), jnp.asarray(maskb),
                jnp.asarray(posb), visual_start,
                jnp.asarray(proposals),
                jnp.asarray(np.array([w, h], np.float32)),
                jnp.asarray(objb), self._jnp_dtype(), self.attn_impl))
        return 1.0 / (1.0 + np.exp(-out[:, :n]))

    def _jnp_dtype(self):
        import jax.numpy as jnp

        return {"float32": jnp.float32,
                "bfloat16": jnp.bfloat16}[self.dtype]

    def _prep_proposals(self, proposals, w, h):
        """Clip to the image and pad the proposal axis to
        max_proposals (padded slots point at a dummy box and are
        sliced off the output). Returns (padded (n_pad, 4), n)."""
        n_pad = self.max_proposals
        pr = np.array(proposals, np.float32, copy=True)[:n_pad]
        pr[:, 0::2] = np.clip(pr[:, 0::2], 0, w)
        pr[:, 1::2] = np.clip(pr[:, 1::2], 0, h)
        n = len(pr)
        if n < n_pad:
            pr = np.concatenate(
                [pr, np.tile(pr[-1:] if n else
                             np.array([[0, 0, 1, 1]], np.float32),
                             (n_pad - n, 1))])
        return pr, n

    def _prefix_layout(self, gh, gw, pad_token_id):
        """Shared-prefix layout for one grid: (ids (1, P), mask
        (1, P), MRoPE positions (3, 1, P), visual_start, next_pos).
        next_pos is the position of the first suffix token — every
        suffix token is text-like, so row positions continue as a
        plain arange from it."""
        c = self.cfg
        mh, mw = gh // c.vision.merge, gw // c.vision.merge
        prefix = self.build_prefix(mh * mw)
        p_real = len(prefix)
        p_pad = -(-p_real // 128) * 128    # flash-tileable prefix
        ids = np.full((1, p_pad), pad_token_id, np.int32)
        ids[0, :p_real] = prefix
        mask = np.zeros((1, p_pad), np.int32)
        mask[0, :p_real] = 1
        visual_start = int(
            np.nonzero(prefix == c.image_token_id)[0][0])
        pos = np.zeros((3, 1, p_pad), np.int32)
        pos[:, 0, :p_real] = get_rope_index_single_image(
            prefix, c.image_token_id, gh, gw, c.vision.merge)
        next_pos = int(visual_start + max(mh, mw)
                       + (p_real - visual_start - mh * mw))
        return ids, mask, pos, visual_start, next_pos

    def _pack_suffixes(self, sufs, s_pad, n_pad, pad_token_id):
        """Right-pad suffix rows; returns (ids, mask, object
        positions) with suffix-relative object indices."""
        b = len(sufs)
        ids = np.full((b, s_pad), pad_token_id, np.int32)
        mask = np.zeros((b, s_pad), np.int32)
        objp = np.zeros((b, n_pad), np.int32)
        for i, suf in enumerate(sufs):
            ids[i, :len(suf)] = suf
            mask[i, :len(suf)] = 1
            objp[i] = np.nonzero(
                suf == self.cfg.object_token_id)[0][:n_pad]
        return ids, mask, objp

    def _dispatch_batches(self, nq, n_pad, ids, mask, pos, obj_pos,
                          step_fn):
        """Run step_fn over query_batch-sized row groups; the final
        partial group is padded by replicating its first row (padded
        rows are sliced off the output). Groups dispatch AHEAD of the
        readbacks (jax dispatch is async) with a bounded in-flight
        window, so later groups' host prep + H2D overlap earlier
        groups' device time and readback round-trips without queueing
        unbounded device buffers on long runs."""
        out = np.zeros((nq, n_pad), np.float32)
        bsz = self.query_batch
        futs = []

        def drain_one():
            sl, rows, fut = futs.pop(0)
            out[sl] = np.asarray(fut)[:rows]

        for st in range(0, nq, bsz):
            en = min(st + bsz, nq)
            pad_rows = bsz - (en - st)
            sl = slice(st, en)
            idsb = np.concatenate([ids[sl]] + [ids[st:st + 1]] * pad_rows)
            maskb = np.concatenate([mask[sl]]
                                   + [mask[st:st + 1]] * pad_rows)
            posb = np.concatenate([pos[:, sl]]
                                  + [pos[:, st:st + 1]] * pad_rows,
                                  axis=1)
            objb = np.concatenate([obj_pos[sl]]
                                  + [obj_pos[st:st + 1]] * pad_rows)
            futs.append((sl, en - st,
                         step_fn(idsb, maskb, posb, objb)))
            if len(futs) > self.dispatch_window:
                drain_one()
        while futs:
            drain_one()
        return out

    def _score_split(self, patches, gh, gw, proposals, n, n_pad,
                     n_img, queries, w, h, pad_token_id):
        """Prefix-sharing scoring path: ONE jitted image-level stage
        (vision + objects + prefix decoder pass) whose device outputs
        feed every query batch's suffix stage — with many queries per
        image (e.g. 80 on COCO-OVD) the image work is not repeated."""
        import jax.numpy as jnp

        from wedetect_tpu.models.ref import (ref_prefix_step,
                                             ref_suffix_step)

        c = self.cfg
        sufs = [self.build_suffix(q, n_pad) for q in queries]
        s_pad = pad_to_bucket(max(len(s) for s in sufs),
                              self.suffix_buckets)
        (prefix_ids, prefix_mask, pos_prefix, visual_start,
         next_pos) = self._prefix_layout(gh, gw, pad_token_id)
        nq = len(sufs)
        suffix_ids, suffix_mask, obj_pos = self._pack_suffixes(
            sufs, s_pad, n_pad, pad_token_id)
        pos_suffix = np.broadcast_to(
            (next_pos + np.arange(s_pad, dtype=np.int32))[None, None],
            (3, nq, s_pad)).copy()

        pmask = jnp.asarray(prefix_mask)
        obj, kvs = ref_prefix_step(
            c, gh, gw, self.params, jnp.asarray(patches),
            jnp.asarray(prefix_ids), pmask, jnp.asarray(pos_prefix),
            jnp.asarray(proposals),
            jnp.asarray(np.array([w, h], np.float32)), visual_start,
            self._jnp_dtype(), self.attn_impl)
        out = self._dispatch_batches(
            nq, n_pad, suffix_ids, suffix_mask, pos_suffix, obj_pos,
            lambda idsb, maskb, posb, objb: ref_suffix_step(
                c, gh, gw, self.params, obj, kvs, jnp.asarray(idsb),
                jnp.asarray(maskb), jnp.asarray(posb), pmask,
                jnp.asarray(objb), self._jnp_dtype(), self.attn_impl))
        return 1.0 / (1.0 + np.exp(-out[:, :n]))

    def score_multi_images(self, images, proposals_list,
                           queries: Sequence[str],
                           pad_token_id: int = 151643):
        """Score proposals across SEVERAL images in ONE conversation
        (RefModules.score_multi — a layout the reference model
        supports but its single-image eval drivers never exercise).

        images: list of HWC uint8 RGB; proposals_list: per-image
        (Ni, 4) xyxy boxes or None (the image is context only);
        queries: list of query strings (each scored in its own row
        against ALL proposals). Returns a list of (num_queries, Ni)
        sigmoid score arrays, one per proposal-bearing image, in image
        order."""
        import jax.numpy as jnp

        from wedetect_tpu.models.ref import ref_score_step_multi

        c = self.cfg
        n_pad = self.max_proposals
        patches_list, grids, ori_list = [], [], []
        boxes_list, n_real = [], []
        for image, proposals in zip(images, proposals_list):
            h, w = image.shape[:2]
            patches, gh, gw = self._prep_patches(image)
            patches_list.append(jnp.asarray(patches))
            grids.append((gh, gw))
            ori_list.append(jnp.asarray(np.array([w, h], np.float32)))
            if proposals is None:
                boxes_list.append(None)
            else:
                pr, n = self._prep_proposals(proposals, w, h)
                boxes_list.append(jnp.asarray(pr))
                n_real.append(n)
        n_total = n_pad * len(n_real)

        m = c.vision.merge
        n_imgs = [(gh // m) * (gw // m) for gh, gw in grids]
        prefix = self.build_prefix_multi(n_imgs)
        img_pos = np.nonzero(prefix == c.image_token_id)[0]
        starts, off = [], 0
        for n in n_imgs:
            starts.append(int(img_pos[off]))
            off += n
        from wedetect_tpu.nn.qwen3vl import get_rope_index_multi

        if self.prefix_sharing:
            out = self._score_multi_split(
                patches_list, grids, boxes_list, ori_list, starts,
                prefix, n_total, queries, pad_token_id)
        else:
            seqs = [np.concatenate([prefix,
                                    self.build_suffix(q, n_total)])
                    for q in queries]
            max_len = max(len(s) for s in seqs)
            l = pad_to_bucket(max_len, self.seq_buckets)
            ids = np.full((len(seqs), l), pad_token_id, np.int32)
            mask = np.zeros((len(seqs), l), np.int32)
            for i, s in enumerate(seqs):
                ids[i, :len(s)] = s
                mask[i, :len(s)] = 1
            obj_pos = np.stack([
                np.nonzero(s == c.object_token_id)[0][:n_total]
                for s in seqs]).astype(np.int32)
            pos = np.stack([
                np.pad(get_rope_index_multi(
                    s, c.image_token_id, tuple(grids), m),
                    ((0, 0), (0, l - len(s))))
                for s in seqs], axis=1).astype(np.int32)   # (3, Q, L)

            out = self._dispatch_batches(
                len(seqs), n_total, ids, mask, pos, obj_pos,
                lambda idsb, maskb, posb, objb: ref_score_step_multi(
                    c, tuple(grids), self.params, tuple(patches_list),
                    jnp.asarray(idsb), jnp.asarray(maskb),
                    jnp.asarray(posb), tuple(boxes_list),
                    tuple(ori_list), tuple(starts), jnp.asarray(objb),
                    self._jnp_dtype(), self.attn_impl))
        scores = 1.0 / (1.0 + np.exp(-out))
        return [scores[:, i * n_pad:i * n_pad + n]
                for i, n in enumerate(n_real)]

    def _score_multi_split(self, patches_list, grids, boxes_list,
                           ori_list, starts, prefix, n_total, queries,
                           pad_token_id):
        """Prefix-sharing factoring of the multi-image conversation:
        every image lives in the shared prefix, so ONE
        ref_prefix_step_multi covers all images' vision + RoI + the
        joint prefix pass; per-query suffixes ride ref_suffix_step."""
        import jax.numpy as jnp

        from wedetect_tpu.models.ref import (ref_prefix_step_multi,
                                             ref_suffix_step)
        from wedetect_tpu.nn.qwen3vl import get_rope_index_multi

        c = self.cfg
        m = c.vision.merge
        p_real = len(prefix)
        p_pad = -(-p_real // 128) * 128
        prefix_ids = np.full((1, p_pad), pad_token_id, np.int32)
        prefix_ids[0, :p_real] = prefix
        pmask = np.zeros((1, p_pad), np.int32)
        pmask[0, :p_real] = 1
        ppos = np.zeros((3, 1, p_pad), np.int32)
        prefix_pos = get_rope_index_multi(
            prefix, c.image_token_id, tuple(grids), m)
        ppos[:, 0, :p_real] = prefix_pos
        next_pos = int(prefix_pos.max()) + 1

        sufs = [self.build_suffix(q, n_total) for q in queries]
        s_pad = pad_to_bucket(max(len(s) for s in sufs),
                              self.suffix_buckets)
        suffix_ids, suffix_mask, obj_pos = self._pack_suffixes(
            sufs, s_pad, n_total, pad_token_id)
        nq = len(sufs)
        pos_suffix = np.broadcast_to(
            (next_pos + np.arange(s_pad, dtype=np.int32))[None, None],
            (3, nq, s_pad)).copy()

        pmask_j = jnp.asarray(pmask)
        obj, kvs = ref_prefix_step_multi(
            c, tuple(grids), self.params, tuple(patches_list),
            jnp.asarray(prefix_ids), pmask_j, jnp.asarray(ppos),
            tuple(boxes_list), tuple(ori_list), tuple(starts),
            self._jnp_dtype(), self.attn_impl)
        return self._dispatch_batches(
            nq, n_total, suffix_ids, suffix_mask, pos_suffix, obj_pos,
            lambda idsb, maskb, posb, objb: ref_suffix_step(
                c, grids[0][0], grids[0][1], self.params, obj, kvs,
                jnp.asarray(idsb), jnp.asarray(maskb),
                jnp.asarray(posb), pmask_j, jnp.asarray(objb),
                self._jnp_dtype(), self.attn_impl))

    def _build_gen_prompt(self, image: np.ndarray, prompt: str,
                          pad_token_id: int, p_pad: int = 0):
        """Shared generation-prompt assembly: image patches + chat
        template ids/mask/MRoPE positions, right-padded to a
        flash-tileable length (the mask keeps pad slots inert) so the
        prefill stays on the flash kernel and prompt-length jitter
        reuses one compile. p_pad>0 forces a specific padded length
        (generate_batch pads a whole group to its max)."""
        from wedetect_tpu.nn.qwen3vl import get_rope_index_single_image

        c = self.cfg
        tok = self.tokenizer
        assert tok is not None, "tokenizer required"
        h, w = image.shape[:2]
        patches, gh, gw = self._prep_patches(image)
        m = c.vision.merge
        n_img = (gh // m) * (gw // m)
        tail = tok.encode(prompt + "<|im_end|>\n<|im_start|>assistant"
                          "\n", add_special_tokens=False)
        ids = np.concatenate([self.build_prefix(n_img),
                              np.array(tail, np.int32)])
        pos = get_rope_index_single_image(
            ids, c.image_token_id, gh, gw, m)
        visual_start = int(np.nonzero(ids == c.image_token_id)[0][0])
        p_real = len(ids)
        if not p_pad:
            p_pad = -(-p_real // 128) * 128
        assert p_real <= p_pad, (p_real, p_pad)
        mask = np.zeros(p_pad, np.int32)
        mask[:p_real] = 1
        ids = np.pad(ids, (0, p_pad - p_real),
                     constant_values=pad_token_id)
        pos = np.pad(pos, ((0, 0), (0, p_pad - p_real)))
        return patches, gh, gw, ids, mask, pos, visual_start, w, h

    def calibrate_decode(self, requests, pad_token_id: int = 151643):
        """Fit the int4 decode tree on CALIBRATION activations before
        serving (models/quant_calib): requests are (image, prompt)
        pairs exactly as in generate_batch; their prefill activations
        set the per-matmul channel statistics that
        quantize_weight4(act_rms=...) minimizes error against. Sets
        the scorer's decode params (so later generate_* calls use the
        calibrated tree) and returns the calib tree. Requires
        quantize_decode == "int4" — int8 is plain absmax. Validate the
        result with cli/quant_gate before enabling in deployment."""
        assert self.quantize_decode == "int4", \
            "calibration applies to the int4 decode fit only"
        import jax.numpy as jnp

        from wedetect_tpu.models.quant import quantize_decode_params
        from wedetect_tpu.models.quant_calib import calibrate_decode_acts

        batches = []
        for image, prompt in requests:
            patches, gh, gw, ids, mask, pos, visual_start, w, h = \
                self._build_gen_prompt(image, prompt, pad_token_id)
            batches.append(dict(
                grid_h=gh, grid_w=gw, patches=jnp.asarray(patches),
                input_ids=ids[None], attn_mask=mask[None],
                position_ids=pos[:, None], visual_start=visual_start,
                boxes_xyxy=np.array([[0, 0, w, h]], np.float32),
                ori_wh=np.array([w, h], np.float32)))
        calib = calibrate_decode_acts(self.cfg, self.params, batches)
        self._decode_params = quantize_decode_params(
            self.params, bits=4, calib=calib)
        return calib

    def generate_batch(self, requests, max_new_tokens: int = 64,
                       eos_token_id: int = 151645,
                       pad_token_id: int = 151643,
                       slots: int = 8, chunk: int = 16,
                       piggyback: bool = False,
                       temperature: float = 0.0, top_k: int = 0,
                       top_p: float = 1.0, seed: int = 0,
                       kv_bits: int = 16):
        """Continuous-batching generation over many (image, prompt)
        requests through models/serve.GenServer — the production
        serving surface (the reference's stage-1/2 twin inherits HF
        .generate(), one static batch at a time,
        qwen3vl_grounding.py:311-379). Requests are grouped by image
        grid bucket (one compiled server per group; images snap to
        grid_buckets exactly as in score()/generate_text()), each
        group's prompts padded to one shared length, and every group
        runs a slot pool with mid-run admission + pipelined chunked
        decode. temperature > 0 samples (optionally top_k / top_p
        warped) with per-request reproducible streams (request i uses
        seed + i; scheduling-invariant — see
        models/serve._sample_rows). Returns decoded texts in input
        order."""
        import jax.numpy as jnp

        from wedetect_tpu.models.serve import GenServer

        tok = self.tokenizer
        if self.quantize_decode and self._decode_params is None:
            from wedetect_tpu.models.quant import quantize_decode_params
            bits = 4 if self.quantize_decode == "int4" else 8
            self._decode_params = quantize_decode_params(self.params,
                                                         bits=bits)
        prepped = []
        groups = {}
        for i, (image, prompt) in enumerate(requests):
            built = self._build_gen_prompt(image, prompt, pad_token_id)
            prepped.append(built)
            gh, gw, visual_start = built[1], built[2], built[6]
            groups.setdefault((gh, gw, visual_start), []).append(i)
        texts = [None] * len(requests)
        for (gh, gw, visual_start), idxs in groups.items():
            p_pad = max(int(prepped[i][4].sum()) for i in idxs)
            p_pad = -(-p_pad // 128) * 128
            srv = GenServer(
                self.cfg, gh, gw, self.params,
                slots=min(slots, len(idxs)), prompt_len=p_pad,
                max_new=max_new_tokens, chunk=chunk,
                eos_id=eos_token_id, pad_id=pad_token_id,
                dtype=self._jnp_dtype(),
                decode_params=self._decode_params,
                piggyback=piggyback, temperature=temperature,
                top_k=top_k, top_p=top_p, kv_bits=kv_bits)
            rid_to_idx = {}
            for i in idxs:
                patches, _, _, ids, mask, pos, _, w, h = prepped[i]
                ids = np.pad(ids[:p_pad], (0, max(0, p_pad - len(ids))),
                             constant_values=pad_token_id)
                mask = np.pad(mask[:p_pad],
                              (0, max(0, p_pad - len(mask))))
                pos = np.pad(pos[:, :p_pad],
                             ((0, 0), (0, max(0, p_pad - pos.shape[1]))))
                next_pos0 = int(pos[:, mask.astype(bool)].max()) + 1
                rid = srv.submit(
                    jnp.asarray(patches), ids, mask, pos, visual_start,
                    next_pos0,
                    boxes_xyxy=np.array([[0, 0, w, h]], np.float32),
                    ori_wh=np.array([w, h], np.float32), seed=seed + i)
                rid_to_idx[rid] = i
            out = srv.run()
            for rid, toks in out.items():
                keep = []
                for t in toks:
                    if t in (eos_token_id, pad_token_id):
                        break
                    keep.append(int(t))
                texts[rid_to_idx[rid]] = (tok.decode(keep)
                                          if hasattr(tok, "decode")
                                          else keep)
        return texts

    def generate_video_text(self, video, prompt: str,
                            max_new_tokens: int = 64,
                            temperature: float = 0.0,
                            eos_token_id: int = 151645,
                            pad_token_id: int = 151643,
                            seed: int = 0, fps: float = None,
                            nframes: int = None) -> str:
        """Video chat/captioning: generation from a VIDEO + user
        prompt. ``video`` is any source data/vision_process.fetch_video
        accepts (file path, frame list/array, directory, glob, GIF,
        .npy) or a pre-decoded (T, H, W, 3) uint8 array; frames are
        sampled (smart_nframes), temporally patched
        (video_to_patches) and fed as one contiguous video span with
        get_rope_index_single_video MRoPE ids — the layout
        train/ref_lm's video SFT trains (the reference reaches video
        chat through the HF processor + inherited ``.generate()``,
        wedetect_ref/models/vision_process.py:403-447 +
        qwen3vl_grounding.py:311-379)."""
        import jax
        import jax.numpy as jnp

        from wedetect_tpu.data.vision_process import (fetch_video,
                                                      video_to_patches)
        from wedetect_tpu.models.ref_generate import ref_generate
        from wedetect_tpu.nn.qwen3vl import get_rope_index_single_video

        c = self.cfg
        tok = self.tokenizer
        assert tok is not None, "tokenizer required"
        frames, _sample_fps = fetch_video(video, fps=fps,
                                          nframes=nframes)
        patches, gt, gh, gw = video_to_patches(
            frames, patch=c.vision.patch,
            temporal_patch=c.vision.temporal_patch,
            merge=c.vision.merge)
        m = c.vision.merge
        n_vid = gt * (gh // m) * (gw // m)
        pre = tok.encode("<|im_start|>user\n", add_special_tokens=False)
        ve = tok.encode("<|vision_end|>", add_special_tokens=False)
        tail = tok.encode(prompt + "<|im_end|>\n<|im_start|>assistant"
                          "\n", add_special_tokens=False)
        ids = np.array(pre + [c.vision_start_token_id]
                       + [c.video_token_id] * n_vid + ve + tail,
                       np.int32)
        pos = get_rope_index_single_video(
            ids, c.video_token_id, gt, gh, gw, m)
        visual_start = int(
            np.nonzero(ids == c.video_token_id)[0][0])
        p_real = len(ids)
        p_pad = -(-p_real // 128) * 128
        mask = np.zeros(p_pad, np.int32)
        mask[:p_real] = 1
        ids = np.pad(ids, (0, p_pad - p_real),
                     constant_values=pad_token_id)
        pos = np.pad(pos, ((0, 0), (0, p_pad - p_real)))
        h, w = frames.shape[1:3]
        if self.quantize_decode and self._decode_params is None:
            from wedetect_tpu.models.quant import quantize_decode_params
            bits = 4 if self.quantize_decode == "int4" else 8
            self._decode_params = quantize_decode_params(self.params,
                                                         bits=bits)
        toks = np.asarray(ref_generate(
            c, gh, gw, self.params, jnp.asarray(patches),
            jnp.asarray(ids[None]), jnp.asarray(mask[None]),
            jnp.asarray(pos[:, None].astype(np.int32)), visual_start,
            jnp.asarray(np.array([pos.max() + 1], np.int32)),
            jnp.asarray(np.array([[0, 0, w, h]], np.float32)),
            jnp.asarray(np.array([w, h], np.float32)),
            max_new_tokens, eos_token_id, temperature, pad_token_id,
            rng=jax.random.PRNGKey(seed),
            decode_params=self._decode_params,
            dtype=self._jnp_dtype(), grid_t=gt))[0]
        keep = []
        for t in toks:
            if t in (eos_token_id, pad_token_id):
                break
            keep.append(int(t))
        return tok.decode(keep) if hasattr(tok, "decode") else keep

    def generate_text(self, image: np.ndarray, prompt: str,
                      max_new_tokens: int = 64,
                      temperature: float = 0.0,
                      eos_token_id: int = 151645,
                      pad_token_id: int = 151643,
                      seed: int = 0,
                      speculative: bool = False,
                      spec_k: int = 8) -> str:
        """Chat/captioning: greedy (or temperature-sampled) generation
        from an image + user prompt through the grounding trunk — the
        TPU twin of the reference stage-1/2 class's inherited HF
        .generate() (qwen3vl_grounding.py:311-379). One jitted call:
        batched prefill + lax.scan KV-cache decode
        (models/ref_generate). Returns the decoded text (tokens up to
        eos). speculative=True (greedy only) uses prompt-lookup
        speculative decoding (models/ref_speculative): exact same
        tokens, fewer HBM-bound decode steps when the output replays
        prompt n-grams."""
        import jax
        import jax.numpy as jnp

        from wedetect_tpu.models.ref_generate import ref_generate

        c = self.cfg
        tok = self.tokenizer
        patches, gh, gw, ids, mask, pos, visual_start, w, h = \
            self._build_gen_prompt(image, prompt, pad_token_id)
        if self.quantize_decode and self._decode_params is None:
            from wedetect_tpu.models.quant import quantize_decode_params
            bits = 4 if self.quantize_decode == "int4" else 8
            self._decode_params = quantize_decode_params(self.params,
                                                         bits=bits)
        gen_args = (
            c, gh, gw, self.params, jnp.asarray(patches),
            jnp.asarray(ids[None].astype(np.int32)),
            jnp.asarray(mask[None]),
            jnp.asarray(pos[:, None].astype(np.int32)), visual_start,
            jnp.asarray(np.array([pos.max() + 1], np.int32)),
            jnp.asarray(np.array([[0, 0, w, h]], np.float32)),
            jnp.asarray(np.array([w, h], np.float32)),
            max_new_tokens, eos_token_id)
        if speculative:
            assert temperature == 0.0, \
                "speculative decoding is greedy-only"
            from wedetect_tpu.models.ref_speculative import (
                ref_generate_spec)
            toks, _steps = ref_generate_spec(
                *gen_args, pad_token_id,
                decode_params=self._decode_params, spec_k=spec_k,
                dtype=self._jnp_dtype())
            toks = np.asarray(toks)[0]
        else:
            toks = np.asarray(ref_generate(
                *gen_args, temperature, pad_token_id,
                rng=jax.random.PRNGKey(seed),
                decode_params=self._decode_params,
                dtype=self._jnp_dtype()))[0]
        keep = []
        for t in toks:
            if t in (eos_token_id, pad_token_id):
                break
            keep.append(int(t))
        return tok.decode(keep) if hasattr(tok, "decode") else keep

    def score_rec(self, samples, pad_token_id: int = 151643):
        """Cross-image REC scoring: `samples` is a list of
        (image HWC u8, proposals (Ni, 4), query str) — ONE query per
        image, the refcoco protocol. Images snapped to the same grid
        bucket are batched into fused steps (vision towers + prefix
        passes vmapped, one suffix pass with per-image KV). Returns a
        list of (Ni,) sigmoid score arrays in input order.

        Requires grid_buckets (images must share a compile-time grid
        to batch); otherwise falls back to per-image score().
        """
        import jax.numpy as jnp

        from wedetect_tpu.models.ref import ref_rec_batch_step

        if not self.prefix_sharing or not self.grid_buckets:
            return [self.score(im, pr, [q], pad_token_id)[0]
                    for im, pr, q in samples]

        c = self.cfg
        n_pad = self.max_proposals
        prepped = []
        for idx, (image, proposals, query) in enumerate(samples):
            h, w = image.shape[:2]
            pr, n = self._prep_proposals(proposals, w, h)
            patches, gh, gw = self._prep_patches(image)
            prepped.append(dict(idx=idx, patches=patches, gh=gh, gw=gw,
                                pr=pr, n=n, wh=(w, h), query=query))

        out = [None] * len(samples)
        futs = []
        groups = {}
        for s in prepped:
            groups.setdefault((s["gh"], s["gw"]), []).append(s)
        for (gh, gw), grp in groups.items():
            (prefix_row_ids, pmask_row_ids, ppos_row, visual_start,
             next_pos) = self._prefix_layout(gh, gw, pad_token_id)
            prefix_row = prefix_row_ids[0]
            pmask_row = pmask_row_ids[0]

            sufs = [self.build_suffix(s["query"], n_pad) for s in grp]
            s_pad = pad_to_bucket(max(len(x) for x in sufs),
                                  self.suffix_buckets)
            bsz = self.query_batch
            for st in range(0, len(grp), bsz):
                chunk = grp[st:st + bsz]
                csufs = sufs[st:st + bsz]
                while len(chunk) < bsz:     # pad group by repetition
                    chunk = chunk + [chunk[-1]]
                    csufs = csufs + [csufs[-1]]
                b = len(chunk)
                sids, smask, objp = self._pack_suffixes(
                    csufs, s_pad, n_pad, pad_token_id)
                spos = np.broadcast_to(
                    (next_pos + np.arange(s_pad, dtype=np.int32)
                     )[None, None], (3, b, s_pad)).copy()
                fut = ref_rec_batch_step(
                    c, gh, gw, self.params,
                    jnp.asarray(np.stack([s["patches"]
                                          for s in chunk])),
                    jnp.asarray(np.tile(prefix_row, (b, 1))),
                    jnp.asarray(np.tile(pmask_row, (b, 1))),
                    jnp.asarray(np.tile(ppos_row, (b, 1, 1, 1))),
                    jnp.asarray(np.stack([s["pr"] for s in chunk])),
                    jnp.asarray(np.array([s["wh"] for s in chunk],
                                         np.float32)),
                    visual_start, self._jnp_dtype(), self.attn_impl,
                    jnp.asarray(sids), jnp.asarray(smask),
                    jnp.asarray(spos), jnp.asarray(objp))
                futs.append((fut, grp[st:st + bsz]))
                if len(futs) > self.dispatch_window:
                    _drain_rec(out, *futs.pop(0))
        # chunks dispatch ahead of readbacks (async jax dispatch) with
        # a bounded in-flight window: later chunks' host prep + H2D
        # overlap earlier chunks' device time and readback round trips
        # without queueing unbounded device buffers on long shards
        while futs:
            _drain_rec(out, *futs.pop(0))
        return out
