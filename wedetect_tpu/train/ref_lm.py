"""WeDetect-Ref stages 1-2 SFT: language-model loss.

Behavioral spec: reference wedetect_ref/sft.py:100-291 (LazySupervised
chat data; labels = input ids with visual/user tokens masked to -100;
standard next-token cross-entropy through the LM head) and
wedetect_ref/models/qwen3vl_grounding.py (stage-2 twin of the
grounding model trained with LM loss instead of focal).

Stage schedule (reference scripts/run_stage{1,2}.sh): stage 1 trains
projectors only (lr 1e-3, vision+LLM frozen); stage 2 unfreezes the
LLM.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wedetect_tpu.nn.qwen3vl import RefCfg
from wedetect_tpu.train.optimizer import make_optimizer
from wedetect_tpu.train.train_step import TrainState

IGNORE_INDEX = -100


def lm_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted next-token CE with -100 masking.

    logits (B, L, V); labels (B, L) with IGNORE_INDEX masked positions.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe = jnp.clip(targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)


def mask_labels(input_ids: np.ndarray, image_token_id: int,
                assistant_spans) -> np.ndarray:
    """Labels: only assistant-turn tokens supervise; image/user tokens
    -> IGNORE (reference sft.py label construction)."""
    labels = np.full_like(input_ids, IGNORE_INDEX)
    for b, spans in enumerate(assistant_spans):
        for (st, en) in spans:
            labels[b, st:en] = input_ids[b, st:en]
    labels[input_ids == image_token_id] = IGNORE_INDEX
    return labels


def stage_optimizer(params, stage: int, base_lr: Optional[float] = None,
                    lr_schedule=None) -> optax.GradientTransformation:
    """Stage 1: projectors only (lr 1e-3); stage 2: everything except
    the vision tower (lr 1e-5); stage 3 handled by ref_sft."""
    if stage == 1:
        lr = base_lr if base_lr is not None else 1e-3
        mults = {"vision": 0.0, "text": 0.0, "embed": 0.0}
    else:
        lr = base_lr if base_lr is not None else 1e-5
        mults = {"vision": 0.0}
    return make_optimizer(params, base_lr=lr, weight_decay=0.0,
                          lr_schedule=lr_schedule,
                          custom_lr_mults=mults)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 8, 13),
                   donate_argnums=(3,))
def ref_lm_step(cfg: RefCfg, grid_h: int, grid_w: int,
                state: TrainState, patches, input_ids, attn_mask,
                position_ids, visual_start: int, boxes, ori_wh,
                object_positions, labels, grid_t: int = 1
                ) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One LM-loss step through the grounding trunk.

    labels: (B, L) token ids with IGNORE_INDEX masking. The LM head is
    the tied input embedding (params['embed']['embed_tokens']
    ['embedding']) unless params contains an 'lm_head' kernel.
    grid_t > 1 feeds a video sample (one contiguous span).
    """
    from wedetect_tpu.models.ref import RefModules

    def loss_fn(params):
        mod = RefModules(cfg, grid_h, grid_w, grid_t=grid_t)
        # reuse the grounding forward for hidden states by scoring with
        # a dummy head: bind the module and call the pieces
        def fwd(p):
            return mod.apply(
                {"params": p}, patches, input_ids, attn_mask,
                position_ids, boxes, ori_wh, visual_start,
                object_positions,
                method=_hidden_states)
        hidden = fwd(params)
        if "lm_head" in params:
            logits = hidden.astype(jnp.float32) @ params[
                "lm_head"]["kernel"].astype(jnp.float32)
        else:
            emb = params["embed"]["embed_tokens"]["embedding"]
            logits = hidden.astype(jnp.float32) @ emb.T.astype(
                jnp.float32)
        return lm_cross_entropy(logits, labels)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state,
                                       state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt), {
        "loss": loss, "grad_norm": optax.global_norm(grads)}


def _hidden_states(mod, patches, input_ids, attn_mask, position_ids,
                   boxes_xyxy, ori_wh, visual_start, object_positions):
    """RefModules method returning final hidden states (pre out_proj)."""
    import jax.numpy as jnp

    c = mod.cfg
    m = c.vision.merge
    mh, mw = mod.grid_h // m, mod.grid_w // m
    d = c.text.hidden
    img_embeds, taps = mod.vision(patches)
    # the RoI pyramid uses the FIRST temporal group (video samples
    # carry dummy boxes; images have grid_t == 1)
    scale3 = img_embeds[:mh * mw].reshape(mh, mw, d)
    scale2 = taps[-1][:mh * mw].reshape(mh, mw, d)
    scale1 = taps[-2][:mh * mw].reshape(mh, mw, d)
    s1, s2, s3 = mod.extras.build_pyramid(scale1, scale2, scale3)
    norm = jnp.asarray([mw * 32.0, mh * 32.0, mw * 32.0, mh * 32.0],
                       jnp.float32)
    ow = jnp.concatenate([ori_wh, ori_wh]).astype(jnp.float32)
    boxes_32 = boxes_xyxy.astype(jnp.float32) / (ow / norm)
    obj = mod.extras.object_feats(s1, s2, s3, boxes_32)
    img_tokens = img_embeds + jnp.tile(mod.extras.image_pos(mh, mw),
                                       (mod.grid_t, 1))
    x = mod.embed(input_ids)
    b, l, _ = x.shape
    v = img_tokens.shape[0]
    x = jax.lax.dynamic_update_slice_in_dim(
        x, jnp.broadcast_to(img_tokens[None].astype(x.dtype),
                            (b, v, d)), visual_start, axis=1)
    # object positions may be -1 (caption-only stage-1/2 samples or
    # padded slots): those keep the original token embedding
    bidx = jnp.arange(b)[:, None]
    pos = jnp.clip(object_positions, 0)
    cur = x[bidx, pos]
    newv = jnp.where((object_positions >= 0)[..., None],
                     jnp.broadcast_to(obj[None].astype(x.dtype),
                                      (b,) + obj.shape), cur)
    x = x.at[bidx, pos].set(newv)
    return mod.text(x, position_ids, attn_mask,
                    deepstack_embeds=list(taps),
                    visual_start=visual_start)
