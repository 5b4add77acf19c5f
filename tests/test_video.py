"""Video preprocessing + video SFT flow.

Behavioral spec: reference wedetect_ref/models/vision_process.py:41-533
(smart_nframes fps sampling, linspace frame indices, per-frame pixel
budget from the model sequence budget, temporal patching).
"""

import json

import numpy as np
import pytest

from wedetect_tpu.data.vision_process import (image_to_patches,
                                              sample_frame_indices,
                                              smart_nframes,
                                              video_to_patches)


def test_smart_nframes_fps_sampling():
    # 300 frames @ 30fps, target 2fps -> 20 frames
    assert smart_nframes(300, 30.0) == 20
    # short clip clamps to min_frames (4, already even)
    assert smart_nframes(10, 30.0) == 4
    # explicit nframes rounds to FRAME_FACTOR (banker's rounding,
    # same as the reference's round_by_factor: round(4.5) == 4)
    assert smart_nframes(100, 30.0, nframes=9) == 8
    assert smart_nframes(100, 30.0, nframes=11) == 12
    # capped by max_frames floored to factor
    assert smart_nframes(10000, 30.0, max_frames=7) == 6
    with pytest.raises(ValueError):
        smart_nframes(1, 30.0)  # fewer frames than FRAME_FACTOR


def test_sample_frame_indices():
    idx = sample_frame_indices(300, 20)
    assert idx[0] == 0 and idx[-1] == 299 and len(idx) == 20
    assert (np.diff(idx) > 0).all()


def test_video_to_patches_layout(rng):
    """grid_t groups; each group's rows equal the per-frame-pair image
    layout (the image path stacks one frame twice; feeding the same
    frame twice per pair must reproduce it)."""
    frames = (rng.random((4, 64, 96, 3)) * 255).astype(np.uint8)
    pair_dup = np.repeat(frames[::2], 2, axis=0)  # f0 f0 f2 f2
    budget = dict(min_pixels=64 * 96, max_pixels=64 * 96)
    p, gt, gh, gw = video_to_patches(pair_dup, patch=4, merge=2,
                                     **budget)
    assert gt == 2 and (gh, gw) == (16, 24)
    assert p.shape == (gt * gh * gw, 3 * 2 * 4 * 4)
    for g, frame in enumerate(frames[::2]):
        want, gh2, gw2 = image_to_patches(frame, patch=4, merge=2,
                                          **budget)
        np.testing.assert_allclose(
            p[g * gh * gw:(g + 1) * gh * gw], want, atol=1e-6)


def test_video_odd_frames_padded(rng):
    frames = (rng.random((3, 64, 96, 3)) * 255).astype(np.uint8)
    p, gt, gh, gw = video_to_patches(frames, patch=4, merge=2,
                                     min_pixels=64 * 96,
                                     max_pixels=64 * 96)
    assert gt == 2  # 3 frames padded to 4 by repeating the last


def test_video_rope_index():
    from wedetect_tpu.nn.qwen3vl import get_rope_index_single_video

    gt, gh, gw, m = 2, 4, 6, 2
    n = gt * (gh // m) * (gw // m)
    ids = np.concatenate([[1, 2, 3], np.full(n, 77), [5, 6]])
    pos = get_rope_index_single_video(ids, 77, gt, gh, gw, m)
    st = 3
    assert (pos[:, :3] == np.arange(3)).all()
    # t advances per temporal group, rows/cols repeat per group
    assert (pos[0, st:st + 6] == st).all()
    assert (pos[0, st + 6:st + 12] == st + 1).all()
    np.testing.assert_array_equal(pos[1, st:st + 6],
                                  pos[1, st + 6:st + 12])
    # text resumes after max(gt, mh, mw)
    assert pos[0, st + n] == st + max(gt, gh // m, gw // m)


@pytest.mark.slow
def test_video_sample_through_ref_lm_step(tmp_path, rng):
    """VERDICT r1 item 8 done-criteria: a video sample flows through
    ChatSftDataset -> ref_lm_step."""
    import cv2

    import jax
    import jax.numpy as jnp

    from wedetect_tpu.cli.train_ref import build_step_inputs
    from wedetect_tpu.data.sft_chat import ChatSftDataset
    from wedetect_tpu.models.ref import RefModules
    from wedetect_tpu.nn.qwen3vl import (RefCfg, RefTextCfg,
                                         RefVisionCfg)
    from wedetect_tpu.train.ref_lm import ref_lm_step, stage_optimizer
    from wedetect_tpu.train.train_step import TrainState

    cfg = RefCfg(
        vision=RefVisionCfg(depth=2, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(0, 1)),
        text=RefTextCfg(vocab_size=200, hidden=48, layers=2, heads=4,
                        kv_heads=2, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=120, video_token_id=121,
        vision_start_token_id=122, object_token_id=123)

    frame_paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        cv2.imwrite(p, (rng.random((64, 96, 3)) * 255).astype(np.uint8))
        frame_paths.append(p)
    data = [{"video": frame_paths, "conversations": [
        {"from": "human", "value": "<video>\nDescribe the clip"},
        {"from": "gpt", "value": "random colors flicker"}]}]
    dp = str(tmp_path / "video_chat.json")
    json.dump(data, open(dp, "w"))

    class StubTok:
        pad_token_id = 0

        def encode(self, s, add_special_tokens=False):
            return [ord(c) % 100 for c in s][:6]

    ds = ChatSftDataset(dp, StubTok(), image_token_id=120,
                        vision_start_token_id=122, object_token_id=123,
                        video_token_id=121, patch=4, merge=2)
    sample = ds.sample(0)
    assert sample["grid_t"] == 2  # 3 frames -> padded pair of 2 groups
    gh, gw = sample["grid"]

    b = build_step_inputs(cfg, sample, stage=2, seq_buckets=(2048,),
                          max_proposals=4, pad_token_id=0)
    mod = RefModules(cfg, gh, gw, grid_t=b["grid_t"])
    params = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(b["patches"]),
        jnp.asarray(b["input_ids"]), jnp.asarray(b["attn_mask"]),
        jnp.asarray(b["position_ids"]), jnp.asarray(b["boxes"]),
        jnp.asarray(b["ori_wh"]), b["visual_start"],
        jnp.asarray(b["object_positions"]))["params"]
    state = TrainState.create({"params": params},
                              stage_optimizer(params, 2))
    state, metrics = ref_lm_step(
        cfg, gh, gw, state, jnp.asarray(b["patches"]),
        jnp.asarray(b["input_ids"]), jnp.asarray(b["attn_mask"]),
        jnp.asarray(b["position_ids"]), b["visual_start"],
        jnp.asarray(b["boxes"]), jnp.asarray(b["ori_wh"]),
        jnp.asarray(b["object_positions"]),
        jnp.asarray(b["labels"]), b["grid_t"])
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_fetch_image_sources(tmp_path):
    """fetch_image accepts every source form the reference's
    fetch_image does (vision_process.py:95-150): array, PIL, bytes,
    path, file://, data:image base64; RGBA composites onto white."""
    import base64
    import io

    from PIL import Image

    from wedetect_tpu.data.vision_process import fetch_image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (40, 32, 3), dtype=np.uint8)
    np.testing.assert_array_equal(fetch_image(arr), arr)

    pil = Image.fromarray(arr)
    np.testing.assert_array_equal(fetch_image(pil), arr)

    path = str(tmp_path / "x.png")
    pil.save(path)
    np.testing.assert_array_equal(fetch_image(path), arr)
    np.testing.assert_array_equal(fetch_image("file://" + path), arr)

    raw = io.BytesIO()
    pil.save(raw, format="PNG")
    np.testing.assert_array_equal(fetch_image(raw.getvalue()), arr)

    uri = "data:image/png;base64," + base64.b64encode(
        raw.getvalue()).decode()
    np.testing.assert_array_equal(fetch_image(uri), arr)

    rgba = np.concatenate(
        [arr, np.zeros((40, 32, 1), np.uint8)], -1)   # fully transparent
    out = fetch_image(Image.fromarray(rgba, "RGBA"))
    assert (out == 255).all()                          # white composite

    gray = fetch_image(arr[..., 0])
    assert gray.shape == (40, 32, 3)

    import pytest

    with pytest.raises(ValueError):
        fetch_image(12345)
