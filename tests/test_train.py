"""Training-step tests: loss finiteness, learning signal, DP sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_detector import mini_cfg
from wedetect_tpu.models.wedetect import init_variables
from wedetect_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        replicate_tree, shard_batch)
from wedetect_tpu.train.optimizer import decay_mask, make_optimizer
from wedetect_tpu.train.train_step import Batch, TrainState, train_step


def make_batch(rng, cfg, b=2, g=8):
    imgs = rng.integers(0, 255, (b, 64, 64, 3), dtype=np.uint8)
    texts = rng.standard_normal((cfg.num_classes, cfg.embed_dims)
                                ).astype(np.float32)
    gt_bboxes = np.zeros((b, g, 4), np.float32)
    gt_labels = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), bool)
    for i in range(b):
        n = int(rng.integers(1, 4))
        ctr = rng.uniform(16, 48, (n, 2))
        wh = rng.uniform(12, 30, (n, 2))
        gt_bboxes[i, :n] = np.concatenate(
            [np.clip(ctr - wh / 2, 0, None),
             np.clip(ctr + wh / 2, None, 64)], -1)
        gt_labels[i, :n] = rng.integers(0, cfg.num_classes, n)
        gt_mask[i, :n] = True
    return Batch(images=jnp.asarray(imgs), texts=jnp.asarray(texts),
                 gt_bboxes=jnp.asarray(gt_bboxes),
                 gt_labels=jnp.asarray(gt_labels),
                 gt_mask=jnp.asarray(gt_mask))


def test_train_step_runs_and_learns(rng):
    cfg = mini_cfg()
    variables = init_variables(cfg, seed=0)
    tx = make_optimizer(variables["params"], base_lr=1e-3)
    state = TrainState.create(variables, tx)
    batch = make_batch(rng, cfg)
    losses = []
    for _ in range(5):
        state, metrics = train_step(cfg, state, batch)
        assert np.isfinite(float(metrics["loss"]))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert float(metrics["num_pos"]) > 0
    assert int(state.step) == 5


def test_decay_mask():
    cfg = mini_cfg()
    variables = init_variables(cfg, seed=0)
    mask = decay_mask(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    names = {"/".join(str(k) for k in p): v for p, v in flat}
    hits = [v for k, v in names.items() if "kernel" in k]
    assert all(hits) and hits
    no = [v for k, v in names.items()
          if k.endswith("'bias']") or "gamma" in k or "scale" in k
          or "alpha" in k]
    assert not any(no) and no


def test_train_step_sharded(rng):
    """DP over the 8-device CPU mesh: global batch sharded on 'data'."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = mini_cfg()
    mesh = make_mesh(data=8)
    variables = init_variables(cfg, seed=0)
    tx = make_optimizer(variables["params"], base_lr=1e-3)
    state = TrainState.create(variables, tx)
    state = jax.tree.map(
        lambda x: x, state)  # noop; params replicated below
    state = state.replace(
        params=replicate_tree(mesh, state.params),
        batch_stats=replicate_tree(mesh, state.batch_stats),
        opt_state=replicate_tree(mesh, state.opt_state))
    batch = make_batch(rng, cfg, b=8)
    batch = Batch(*shard_batch(mesh, tuple(batch)))
    state, metrics = train_step(cfg, state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # parity with the unsharded step on the same global batch
    state2 = TrainState.create(init_variables(cfg, seed=0), tx)
    host_batch = Batch(*(np.asarray(x) for x in batch))
    state2, metrics2 = train_step(cfg, state2, host_batch)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics2["loss"]), rtol=1e-4)

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
