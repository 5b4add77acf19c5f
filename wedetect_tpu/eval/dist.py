"""Multi-host collectives for eval merges.

TPU-native replacement for torch.distributed.all_gather_object
(reference: eval_recall/eval_recall.py:1566-1588,
eval_retrieval/extract_embedding.py:1746-1775,
wedetect_ref/eval_grounding/eval.py:1671-1709): arbitrary picklable
python objects are serialized to uint8 arrays, padded to the global
max length, and exchanged with
jax.experimental.multihost_utils.process_allgather over DCN.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def all_gather_object(obj: Any) -> List[Any]:
    """Gather one picklable object from every process (ordered by
    process index). Single-process: returns [obj]."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    max_len = int(sizes.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        n = int(sizes[i][0] if sizes.ndim > 1 else sizes[i])
        out.append(pickle.loads(gathered[i, :n].tobytes()))
    return out


def barrier(name: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
