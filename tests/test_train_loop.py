"""Integration: the training loop overfits a tiny synthetic task."""

import numpy as np
import pytest

import jax.numpy as jnp

from test_detector import mini_cfg
from wedetect_tpu.models.wedetect import forward_raw, init_variables
from wedetect_tpu.ops.priors import flat_priors_and_strides
from wedetect_tpu.train.loop import (TrainLoopCfg, make_batch_iterator,
                                     run_training)
from wedetect_tpu.train.optimizer import make_optimizer
from wedetect_tpu.train.train_step import TrainState


@pytest.mark.slow
def test_overfit_synthetic():
    cfg = mini_cfg(num_classes=2)
    rng0 = np.random.default_rng(0)
    w_emb = rng0.standard_normal((2, cfg.embed_dims)).astype(np.float32)
    w_emb /= np.linalg.norm(w_emb, axis=-1, keepdims=True)

    def sample_fn(rng):
        img = np.full((64, 64, 3), 30, np.uint8)
        cls = int(rng.integers(0, 2))
        x, y = int(rng.integers(4, 30)), int(rng.integers(4, 30))
        bw, bh = int(rng.integers(16, 30)), int(rng.integers(16, 30))
        color = (220, 40, 40) if cls == 0 else (40, 220, 40)
        img[y:y + bh, x:x + bw] = color
        return {"image": img,
                "gt_bboxes": np.array([[x, y, x + bw, y + bh]],
                                      np.float32),
                "gt_labels": np.array([cls], np.int64),
                "texts": ["red", "green"]}

    variables = init_variables(cfg, seed=0)
    tx = make_optimizer(variables["params"], base_lr=2e-3)
    state = TrainState.create(variables, tx)
    loop_cfg = TrainLoopCfg(steps=60, batch_size=4, log_every=30)
    batches = make_batch_iterator(cfg, loop_cfg, sample_fn,
                                  lambda texts: w_emb, seed=0,
                                  num_workers=2)
    losses = []
    state = run_training(
        cfg, state, batches, loop_cfg,
        log_fn=lambda s, m: losses.append(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses

    # the trained model should score the gt box region for the right
    # class higher than background anchors
    s = sample_fn(np.random.default_rng(123))
    out = forward_raw(
        cfg, {"params": state.params,
              "batch_stats": state.batch_stats},
        jnp.asarray(s["image"][None]), jnp.asarray(w_emb))
    scores = np.asarray(out.scores[0])          # (A, 2)
    priors, _ = flat_priors_and_strides(cfg.feat_sizes(), cfg.strides)
    box = s["gt_bboxes"][0]
    cls = int(s["gt_labels"][0])
    inside = ((priors[:, 0] > box[0]) & (priors[:, 0] < box[2])
              & (priors[:, 1] > box[1]) & (priors[:, 1] < box[3]))
    assert inside.any()
    assert (scores[inside, cls].max()
            > np.percentile(scores[~inside, cls], 99))
