"""Ref SFT launcher: 3-stage tiny run on CPU, checkpoint + resume,
stage-3 loss falls (the VERDICT r1 item-4 done-criteria)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wedetect_tpu.nn.qwen3vl import RefCfg, RefTextCfg, RefVisionCfg


class StubTok:
    pad_token_id = 0

    def encode(self, s, add_special_tokens=False):
        return [ord(c) % 100 for c in s][:6]


@pytest.fixture(scope="module")
def tiny_ref_setup(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("refsft")
    cfg = RefCfg(
        vision=RefVisionCfg(depth=2, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(0, 1)),
        text=RefTextCfg(vocab_size=200, hidden=48, layers=2, heads=4,
                        kv_heads=2, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=120, vision_start_token_id=122,
        object_token_id=123)
    rng = np.random.default_rng(0)
    img_path = str(root / "img0.png")
    cv2.imwrite(img_path, (rng.random((32, 48, 3)) * 255
                           ).astype(np.uint8))

    chat = [{"image": img_path, "conversations": [
        {"from": "human", "value": "<image>\nDescribe the image"},
        {"from": "gpt", "value": "a colorful noise pattern"}]}]
    chat_path = str(root / "chat.json")
    json.dump(chat, open(chat_path, "w"))

    stage3 = [{"image": img_path, "class_name": "red blob",
               "bounding_boxes": [[2.0, 2.0, 20.0, 20.0]]}]
    s3_path = str(root / "stage3.json")
    json.dump(stage3, open(s3_path, "w"))
    props = {img_path: [[0.0, 0.0, 22.0, 22.0], [30.0, 5.0, 46.0, 30.0],
                        [10.0, 10.0, 40.0, 28.0]]}
    props_path = str(root / "props.json")
    json.dump(props, open(props_path, "w"))

    # params init via a dummy apply on the (8, 12) grid
    from wedetect_tpu.models.ref import RefModules

    gh, gw = 8, 12
    mod = RefModules(cfg, gh, gw)
    patches = rng.standard_normal((gh * gw, 96)).astype(np.float32)
    ids = rng.integers(0, 100, (1, 128)).astype(np.int32)
    mask = np.ones((1, 128), np.int32)
    pos = np.tile(np.arange(128)[None, None], (3, 1, 1)).astype(np.int32)
    boxes = np.array([[1, 1, 30, 40]], np.float32)
    objpos = np.array([[60]], np.int32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(patches),
                      jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(pos), jnp.asarray(boxes),
                      jnp.asarray([48.0, 32.0]), 4,
                      jnp.asarray(objpos))["params"]
    return cfg, params, chat_path, s3_path, props_path


def _dataset(cfg, stage, chat_path, s3_path, props_path):
    from wedetect_tpu.data.sft_chat import (ChatSftDataset,
                                            ReferringSftDataset)

    if stage == 3:
        return ReferringSftDataset(
            s3_path, props_path, StubTok(),
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            object_token_id=cfg.object_token_id, max_proposals=8,
            patch=cfg.vision.patch, merge=cfg.vision.merge, seed=0)
    return ChatSftDataset(
        chat_path, StubTok(), image_token_id=cfg.image_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        object_token_id=cfg.object_token_id,
        patch=cfg.vision.patch, merge=cfg.vision.merge, seed=0)


@pytest.mark.slow
def test_three_stages_checkpoint_resume(tiny_ref_setup, tmp_path):
    from wedetect_tpu.ckpt.io import (latest_checkpoint,
                                      restore_train_state)
    from wedetect_tpu.cli.train_ref import train_ref_loop
    from wedetect_tpu.train.ref_lm import stage_optimizer
    from wedetect_tpu.train.ref_sft import ref_optimizer
    from wedetect_tpu.train.train_step import TrainState

    cfg, params, chat_path, s3_path, props_path = tiny_ref_setup
    kw = dict(seq_buckets=(128,), max_proposals=8, pad_token_id=0,
              log_every=100)

    # the jitted steps donate the state: give each stage its own copy
    def fresh():
        return jax.tree_util.tree_map(jnp.array, params)

    # stages 1 and 2: LM loss over the chat data runs and is finite
    losses = {}
    for stage in (1, 2):
        p = fresh()
        tx = stage_optimizer(p, stage)
        state = TrainState.create({"params": p}, tx)
        ds = _dataset(cfg, stage, chat_path, s3_path, props_path)
        state = train_ref_loop(cfg, state, ds, stage, 2, **kw)
        assert int(state.step) == 2

    # stage 3: checkpoints written, loss falls, resume continues
    ckpt_dir = str(tmp_path / "ref3")
    p = fresh()
    tx = ref_optimizer(p, base_lr=2e-3)
    state = TrainState.create({"params": p}, tx)
    ds = _dataset(cfg, 3, chat_path, s3_path, props_path)
    seen = []
    state = train_ref_loop(cfg, state, ds, 3, 12, ckpt_dir=ckpt_dir,
                           ckpt_every=6, log_every=4,
                           log_fn=lambda s, m: seen.append(m["loss"]),
                           **{k: v for k, v in kw.items()
                              if k != "log_every"})
    assert int(state.step) == 12
    assert seen[-1] < seen[0], seen   # focal loss falls
    last = latest_checkpoint(ckpt_dir)
    assert last is not None and last.endswith("step_12")

    # resume: fresh state restores step + params and continues
    p2 = fresh()
    state2 = TrainState.create({"params": p2},
                               ref_optimizer(p2, base_lr=2e-3))
    state2 = restore_train_state(last, state2)
    assert int(state2.step) == 12
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    state2 = train_ref_loop(cfg, state2, ds, 3, 14, **kw)
    assert int(state2.step) == 14


def test_lr_schedule():
    from wedetect_tpu.train.optimizer import make_lr_schedule

    s = make_lr_schedule(1e-3, 100, warmup_steps=10)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1e-3)
    assert float(s(100)) < 2e-5  # cosine floor ~ base * 0.01
    c = make_lr_schedule(1e-3, 100, schedule="constant")
    assert float(c(50)) == pytest.approx(1e-3)


def test_drop_path(rng):
    from wedetect_tpu.nn.convnext import ConvNeXt

    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3))
                    .astype(np.float32))
    net = ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                   drop_path_rate=0.9)
    params = net.init(jax.random.PRNGKey(0), x)
    # deterministic: identical regardless of rate
    a = net.apply(params, x, deterministic=True)
    ref = ConvNeXt(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64)
                   ).apply(params, x)
    np.testing.assert_allclose(np.asarray(a[3]), np.asarray(ref[3]),
                               rtol=1e-6)
    # stochastic: different rngs give different outputs (layer-scale
    # init 1e-6 keeps the branch tiny, so compare exactly, not close)
    b = net.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    c = net.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(b[3]) - np.asarray(c[3])).max() > 0

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
