"""Native checkpoint save/load (orbax) + train-state restore.

Replaces the reference's torch.save/mmengine CheckpointHook
(SURVEY.md §5.4) with orbax: sharding-aware, async-capable, atomic.
Works for both detector variables and Ref param trees.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree checkpoint to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; `like` provides structure/sharding
    (abstract arrays ok)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(path)
    return ckptr.restore(path, like)


def save_train_state(path: str, state) -> None:
    """Full training checkpoint: params + batch_stats + opt_state +
    step (the reference's HF resume_from_checkpoint carries the same
    — sft_referring.py:439-443)."""
    save_checkpoint(path, {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    })


def restore_train_state(path: str, state):
    """Restore into an existing TrainState (provides structure and
    shardings); returns the updated state."""
    tree = load_checkpoint(path, {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    })
    return state.replace(step=tree["step"], params=tree["params"],
                         batch_stats=tree["batch_stats"],
                         opt_state=tree["opt_state"])


def latest_checkpoint(root: str) -> Optional[str]:
    """Find the highest-numbered step directory under root
    (HF get_last_checkpoint semantics — sft_referring.py:439-443)."""
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(root, f"step_{max(steps)}")
