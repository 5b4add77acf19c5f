"""Shared model/batch construction for the distributed-training tests.

Used by tests/test_multiprocess_train.py from BOTH sides of the
comparison: the 2-process jax.distributed run and the 1-process
8-device control run execute this exact code, so any loss difference
isolates the cross-process collective path (grad psum over DCN,
SyncBN global-batch stats) rather than setup drift.
"""

import numpy as np


def build_tiny():
    """Deterministic tiny detector + global batch (b=8)."""
    from wedetect_tpu.configs import ModelCfg, TestCfg
    from wedetect_tpu.models.wedetect import init_variables
    from wedetect_tpu.train.optimizer import make_optimizer
    from wedetect_tpu.train.train_step import Batch, TrainState

    cfg = ModelCfg(
        name="dist-tiny", depths=(1, 1, 2, 1), dims=(32, 64, 128, 256),
        neck_scale=0.25, neck_repeats=2,
        head_in_channels=(32, 64, 128), embed_dims=32,
        img_size=(64, 64), text=None, num_classes=8,
        test=TestCfg(nms_pre=256, max_per_img=16))
    variables = init_variables(cfg, seed=0)
    tx = make_optimizer(variables["params"])
    state = TrainState.create(variables, tx)

    b = 8
    rng = np.random.default_rng(0)
    gt = np.tile(np.array([[8, 8, 40, 40], [16, 16, 56, 56]],
                          np.float32), (b, 1, 1))
    batch = Batch(
        images=rng.integers(0, 255, (b, 64, 64, 3)).astype(np.uint8),
        texts=rng.standard_normal(
            (cfg.num_classes, cfg.embed_dims)).astype(np.float32),
        gt_bboxes=gt,
        gt_labels=np.zeros((b, 2), np.int32),
        gt_mask=np.ones((b, 2), bool))
    return cfg, state, batch


def run_steps(mesh, n_steps=2):
    """Shard state/batch over `mesh`, run n train steps, return the
    per-step losses (floats)."""
    import jax

    from wedetect_tpu.parallel.mesh import (fsdp_sharding,
                                            replicate_tree,
                                            shard_batch)
    from wedetect_tpu.train.train_step import Batch, train_step

    cfg, state, batch = build_tiny()
    state = state.replace(
        params=jax.device_put(state.params,
                              fsdp_sharding(mesh, state.params)),
        batch_stats=replicate_tree(mesh, state.batch_stats),
        opt_state=jax.device_put(state.opt_state,
                                 fsdp_sharding(mesh, state.opt_state)))
    batch = Batch(*shard_batch(mesh, tuple(batch)))
    losses = []
    for _ in range(n_steps):
        state, metrics = train_step(cfg, state, batch)
        losses.append(float(metrics["loss"]))
    return losses
