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


def maybe_initialize() -> None:
    """Join the multihost job when launch env says there is one — the
    CLI-side half of the reference's ``--launcher pytorch`` + torchrun
    rendezvous (dist_test.sh:1-24). On TPU pods
    ``jax.distributed.initialize()`` discovers peers from the TPU
    metadata, so the SAME command runs on every host (scripts/
    dist_test.sh); elsewhere the standard JAX env triple
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)
    or the explicit WEDETECT_DIST=1 opt-in triggers the join.
    Single-host runs are untouched. Safe to call twice."""
    import os

    global _initialized
    if _initialized:
        return
    want = (os.environ.get("WEDETECT_DIST") == "1"
            or "JAX_COORDINATOR_ADDRESS" in os.environ
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not want:
        return
    kwargs = {}
    # pass the env triple explicitly — initialize() auto-detects TPU
    # pods and some cluster envs, but the plain JAX_* triple is not
    # fully consumed on CPU/GPU clusters (num_processes stays unset)
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        kwargs["coordinator_address"] = \
            os.environ["JAX_COORDINATOR_ADDRESS"]
    if "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # noqa: BLE001 — stay single-process: the
        # scripts default WEDETECT_DIST=1 so the same launcher works
        # on pods AND plain single hosts, where initialize() has no
        # coordinator to find (or was already called by the launcher)
        import sys

        print(f"# single-process run (jax.distributed: {e})",
              file=sys.stderr)
    _initialized = True


_initialized = False


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
