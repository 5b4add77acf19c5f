"""Optimizer construction with the reference's param-group rules.

Behavioral spec: reference
wedetect/engine/optimizers/yolow_v5_optim_constructor.py:18-196
(YOLOWv5OptimizerConstructor): AdamW with
- batch-size-scaled weight decay:
  wd *= total_batch_size / base_total_batch_size(64)
- no decay on 1-D params (biases, norm scales/biases, scalars) when the
  flat/norm/bias decay mults are 0 (the YOLO convention the constructor
  encodes)
- optional per-substring lr/decay multipliers (custom_keys)
Hyper-params from config/wedetect_base.py:12-13: base_lr 5e-4,
weight_decay 0.05/2.

Implemented as optax transforms with masks over the param pytree —
no mutable param groups; the masks are static functions of the tree
structure so everything stays jit/pjit friendly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import optax


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(getattr(p, "idx", p)))
                    for p in path)


def decay_mask(params: Any) -> Any:
    """True where weight decay applies: ndim >= 2 (conv/linear kernels,
    embeddings), excluding anything named bias/scale/alpha/gamma."""

    def f(path, x):
        name = _path_str(path).lower()
        if x.ndim < 2:
            return False
        for bad in ("bias", "scale", "alpha", "gamma", "logit_scale"):
            if name.endswith(bad):
                return False
        return True

    return jax.tree_util.tree_map_with_path(f, params)


def make_lr_schedule(base_lr: float, total_steps: int,
                     warmup_steps: int = 0,
                     schedule: str = "cosine",
                     final_lr_ratio: float = 0.01) -> optax.Schedule:
    """Linear warmup from 0 then cosine/linear decay to
    base_lr * final_lr_ratio (mmengine LinearLR warmup +
    CosineAnnealingLR, the schedule family the reference's configs
    use), or constant after warmup."""
    decay_steps = max(total_steps - warmup_steps, 1)
    end = base_lr * final_lr_ratio
    if schedule == "cosine":
        main = optax.cosine_decay_schedule(
            base_lr, decay_steps, alpha=final_lr_ratio)
    elif schedule == "linear":
        main = optax.linear_schedule(base_lr, end, decay_steps)
    elif schedule == "constant":
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(schedule)
    if warmup_steps <= 0:
        return main
    warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warm, main], [warmup_steps])


def with_grad_accum(tx: optax.GradientTransformation,
                    accum_steps: int) -> optax.GradientTransformation:
    """Gradient accumulation (the reference optimizer wrapper's
    _accumulative_counts, yolow_v5_optim_constructor.py:160-196):
    updates apply every `accum_steps` micro-batches."""
    if accum_steps <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=accum_steps)


def make_optimizer(params: Any,
                   base_lr: float = 5e-4,
                   weight_decay: float = 0.05 / 2,
                   total_batch_size: int = 64,
                   base_total_batch_size: int = 64,
                   betas: Tuple[float, float] = (0.9, 0.999),
                   lr_schedule: Optional[optax.Schedule] = None,
                   custom_lr_mults: Optional[Dict[str, float]] = None,
                   grad_clip_norm: Optional[float] = None
                   ) -> optax.GradientTransformation:
    """AdamW with masked, batch-scaled weight decay.

    custom_lr_mults: {key: mult} applied to params whose path
    contains `key` as a full path SEGMENT (or segment-sequence when
    the key contains "/"). Segment matching avoids substring
    collisions — e.g. the key "vision" must not catch
    "extras/object_vision_projector" (reference custom_keys
    semantics, yolow_v5_optim_constructor.py:44-76).
    """
    wd = weight_decay * total_batch_size / base_total_batch_size
    lr = lr_schedule if lr_schedule is not None else base_lr

    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    chain.append(optax.add_decayed_weights(
        wd, mask=lambda p: decay_mask(p)))
    if custom_lr_mults:
        def mult_fn(path, x):
            segs = _path_str(path).split("/")
            m = 1.0
            for key, v in custom_lr_mults.items():
                ks = key.split("/")
                if any(segs[i:i + len(ks)] == ks
                       for i in range(len(segs) - len(ks) + 1)):
                    m = v
            return m

        def scale_by_mults():
            def init(params):
                return optax.EmptyState()

            def update(updates, state, params=None):
                return jax.tree_util.tree_map_with_path(
                    lambda p, u: u * mult_fn(p, u), updates), state

            return optax.GradientTransformation(init, update)

        chain.append(scale_by_mults())
    chain.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*chain)
