"""Device mesh + sharding helpers (the TPU-native L1 layer).

Replaces the reference's torchrun+NCCL DDP / DeepSpeed ZeRO stack
(SURVEY.md §2.6; reference dist_test.sh:12-23,
config/wedetect_base.py:135, wedetect_ref/scripts/zero*.json) with
jax.sharding over a Mesh:

- data parallel  = batch axis sharded over "data"; XLA inserts psum
  for gradients, and batch-norm statistics are computed over the
  GLOBAL batch automatically (jit global-view semantics), which is
  exactly SyncBatchNorm.
- ZeRO-style optimizer sharding = shard params/opt-state over "fsdp"
  (largest-axis heuristic) while keeping the batch on "data".
- eval-merge all_gather_object -> jax.experimental.multihost_utils
  (wedetect_tpu.eval.dist).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, fsdp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "fsdp") mesh. data=-1 -> all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % fsdp == 0
        data = n // fsdp
    assert data * fsdp == n, f"{data}x{fsdp} != {n} devices"
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(("data",)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_sharding(mesh: Mesh, tree: Any) -> Any:
    """ZeRO-3-style param sharding: shard each array's largest
    axis that divides the fsdp size; replicate the rest.

    TPU equivalent of DeepSpeed ZeRO param partitioning
    (reference: wedetect_ref/scripts/zero3.json).
    """
    size = mesh.shape["fsdp"]

    def spec(x):
        if size == 1 or not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % size == 0 and x.shape[d] >= size:
                parts: list = [None] * x.ndim
                parts[d] = "fsdp"
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def make_tp_mesh(data: int = 1, tp: int = -1,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """("data", "tp") mesh for tensor-parallel LLM serving/training
    (the optional TP axis SURVEY §2.6 flags for the 4B Ref model).
    tp=-1 -> all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp == -1:
        assert n % data == 0
        tp = n // data
    assert data * tp == n, f"{data}x{tp} != {n} devices"
    return Mesh(np.asarray(devices).reshape(data, tp), ("data", "tp"))


# Megatron-style decoder TP rules: column-parallel for the projections
# whose OUTPUT carries heads / ffn channels, row-parallel where that
# axis is contracted back to hidden — XLA then inserts exactly one
# reduce per attention/MLP block (the psum the Megatron pattern
# prescribes), with activations sharded (B, L, heads/tp, D).
_TP_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
           "qkv", "fc1", "fc0")
_TP_ROW = ("o_proj", "down_proj", "proj", "fc2")


def ref_tp_sharding(mesh: Mesh, params: Any, axis: str = "tp") -> Any:
    """Tensor-parallel sharding specs for the Ref (Qwen3-VL) param
    tree. Column-parallel kernels shard the output dim, row-parallel
    the input dim, embeddings the vocab dim; norms/biases/small
    extras replicate."""
    size = mesh.shape[axis]

    def spec(path, x):
        segs = [getattr(p, "key", str(getattr(p, "idx", p)))
                for p in path]
        name = segs[-1]
        parent = segs[-2] if len(segs) > 1 else ""
        if size == 1 or not hasattr(x, "shape") or x.ndim < 2:
            return NamedSharding(mesh, P())
        if "extras" in segs:  # grounding extras are tiny; replicate
            return NamedSharding(mesh, P())
        if name == "embedding" and x.shape[0] % size == 0:
            return NamedSharding(mesh, P(axis, None))
        if name == "kernel" and x.ndim == 2:
            if parent in _TP_COL and x.shape[1] % size == 0:
                return NamedSharding(mesh, P(None, axis))
            if parent in _TP_ROW and x.shape[0] % size == 0:
                return NamedSharding(mesh, P(axis, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the leading axis over "data".

    Leaves whose leading dim is not divisible by the data-axis size
    (e.g. a shared (K, C) text bank riding along with the batch) are
    replicated instead.
    """
    n = mesh.shape["data"]
    sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        ok = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
        return jax.device_put(x, sh if ok else rep)

    return jax.tree.map(put, batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
