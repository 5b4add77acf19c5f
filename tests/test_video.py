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


def test_fetch_video_sources(tmp_path, rng):
    """fetch_video accepts every source form the reference's
    fetch_video does (wedetect_ref/models/vision_process.py:403-447):
    video file (cv2 backend), frame list (padded to FRAME_FACTOR,
    :430-432), array, directory, glob, GIF animation, .npy stack."""
    import cv2
    from PIL import Image

    from wedetect_tpu.data.vision_process import (FRAME_FACTOR,
                                                  VIDEO_FPS,
                                                  fetch_video)

    frames = (rng.random((5, 32, 48, 3)) * 255).astype(np.uint8)

    # array: padded 5 -> 6 by repeating the last frame
    out, fps = fetch_video(frames)
    assert out.shape == (6, 32, 48, 3) and fps == VIDEO_FPS
    np.testing.assert_array_equal(out[:5], frames)
    np.testing.assert_array_equal(out[5], frames[4])

    # list of paths (+ directory + glob of the same files)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"f{i:02d}.png")
        Image.fromarray(frames[i]).save(p)
        paths.append(p)
    out, _ = fetch_video(paths)
    assert out.shape == (4, 32, 48, 3)
    np.testing.assert_array_equal(out, frames[:4])
    out_dir, _ = fetch_video(str(tmp_path))
    np.testing.assert_array_equal(out_dir, out)
    out_glob, _ = fetch_video(str(tmp_path / "f*.png"))
    np.testing.assert_array_equal(out_glob, out)

    # mixed-size frame list: stragglers resize to the first frame
    big = str(tmp_path / "big.png")
    Image.fromarray((rng.random((64, 96, 3)) * 255
                     ).astype(np.uint8)).save(big)
    out, _ = fetch_video([paths[0], big])
    assert out.shape == (2, 32, 48, 3)

    # .npy stack + file:// prefix
    npy = str(tmp_path / "stack.npy")
    np.save(npy, frames)
    out, _ = fetch_video("file://" + npy)
    assert out.shape == (6, 32, 48, 3)

    # GIF animation: duration metadata sets the source fps; the
    # standard smart_nframes sampling applies (30 frames @ 10 fps,
    # target 2 fps -> 6 frames)
    gif = str(tmp_path / "clip.gif")
    gframes = [Image.fromarray((rng.random((32, 48, 3)) * 255
                                ).astype(np.uint8)) for _ in range(30)]
    gframes[0].save(gif, save_all=True, append_images=gframes[1:],
                    duration=100, loop=0)
    out, fps = fetch_video(gif)
    assert out.shape[0] == 6 and abs(fps - 2.0) < 0.01

    # real video file through the cv2 backend (MJPG avi, 12 frames
    # @ 10 fps -> 2 fps sampling keeps 4 = FPS_MIN_FRAMES)
    avi = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(avi, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (48, 32))
    assert w.isOpened()
    for f in frames:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()
    out, _ = fetch_video(avi)
    assert out.shape[1:] == (32, 48, 3)
    assert out.shape[0] % FRAME_FACTOR == 0
    out_n, _ = fetch_video(avi, nframes=6)
    assert out_n.shape[0] == 6

    with pytest.raises(ValueError):
        fetch_video(123)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError):
        fetch_video(str(empty))


@pytest.mark.slow
def test_generate_video_text_matches_joint_forward(rng):
    """Greedy VIDEO generation (ref_generate grid_t > 1) must pick
    exactly the tokens the teacher-forced joint forward picks — the
    same self-consistency pin the image path has
    (tests/test_ref_generate.py), over the video span layout
    train/ref_lm trains."""
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.models.ref import RefModules
    from wedetect_tpu.models.ref_generate import (_lm_logits,
                                                  ref_generate)
    from wedetect_tpu.nn.qwen3vl import (RefCfg, RefTextCfg,
                                         RefVisionCfg,
                                         get_rope_index_single_video)
    from wedetect_tpu.train.ref_lm import _hidden_states

    cfg = RefCfg(
        vision=RefVisionCfg(depth=2, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(0, 1)),
        text=RefTextCfg(vocab_size=96, hidden=48, layers=2, heads=4,
                        kv_heads=2, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=90, video_token_id=89,
        vision_start_token_id=91, object_token_id=92)
    gt, gh, gw = 2, 8, 8
    n_vid = gt * (gh // 2) * (gw // 2)
    patches = rng.standard_normal(
        (gt * gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    ids0 = np.concatenate([
        np.array([1, 91]), np.full(n_vid, 89),
        rng.integers(2, 80, 5)]).astype(np.int32)
    pos0 = get_rope_index_single_video(ids0, 89, gt, gh, gw, 2)
    ids = ids0[None]
    mask = np.ones((1, len(ids0)), np.int32)
    pos = pos0[:, None]
    boxes = np.array([[0, 0, 64, 64]], np.float32)
    ori = np.array([64.0, 64.0], np.float32)

    mod = RefModules(cfg, gh, gw, grid_t=gt)
    params = mod.init(
        jax.random.PRNGKey(5), jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), jnp.asarray(boxes),
        jnp.asarray(ori), 2, jnp.zeros((1, 1), jnp.int32))["params"]

    max_new = 4
    toks = np.asarray(ref_generate(
        cfg, gh, gw, params, jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), 2,
        jnp.asarray(np.array([pos0.max() + 1], np.int32)),
        jnp.asarray(boxes), jnp.asarray(ori), max_new, eos_id=95,
        pad_id=0, grid_t=gt))
    assert toks.shape == (1, max_new)

    seq = ids0.copy()
    stopped = False
    for t in range(max_new):
        if stopped:
            assert toks[0, t] == 0
            continue
        pos_t = get_rope_index_single_video(seq, 89, gt, gh, gw, 2)
        hidden = mod.apply(
            {"params": params}, jnp.asarray(patches),
            jnp.asarray(seq[None]), jnp.ones((1, len(seq)), jnp.int32),
            jnp.asarray(pos_t[:, None]), jnp.asarray(boxes),
            jnp.asarray(ori), 2, jnp.full((1, 1), -1, jnp.int32),
            method=_hidden_states)
        want = int(np.argmax(np.asarray(
            _lm_logits(params, hidden[0, -1]))))
        assert int(toks[0, t]) == want, (t, toks[0], want)
        seq = np.concatenate([seq, [want]]).astype(np.int32)
        if want == 95:
            stopped = True


@pytest.mark.slow
def test_generate_video_text_api(rng, tmp_path):
    """RefScorer.generate_video_text drives fetch_video ->
    video_to_patches -> grid_t generation end to end from a GIF
    file."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from wedetect_tpu.models.ref import RefModules
    from wedetect_tpu.models.ref_api import RefScorer
    from wedetect_tpu.nn.qwen3vl import (RefCfg, RefTextCfg,
                                         RefVisionCfg)

    cfg = RefCfg(
        vision=RefVisionCfg(depth=2, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(0, 1)),
        text=RefTextCfg(vocab_size=256, hidden=48, layers=2, heads=4,
                        kv_heads=2, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=120, video_token_id=121,
        vision_start_token_id=122, object_token_id=123)

    gif = str(tmp_path / "clip.gif")
    gframes = [Image.fromarray((rng.random((64, 96, 3)) * 255
                                ).astype(np.uint8)) for _ in range(4)]
    gframes[0].save(gif, save_all=True, append_images=gframes[1:],
                    duration=500, loop=0)

    class Tok:
        def encode(self, s, add_special_tokens=False):
            return [(ord(c) % 80) + 1 for c in s][:8]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    # init params at the exact video shapes the scorer will build
    from wedetect_tpu.data.vision_process import (fetch_video,
                                                  video_to_patches)
    frames, _ = fetch_video(gif)
    patches, gt, gh, gw = video_to_patches(
        frames, patch=4, temporal_patch=2, merge=2)
    mod = RefModules(cfg, gh, gw, grid_t=gt)
    n_vid = gt * (gh // 2) * (gw // 2)
    ids = np.concatenate([[1, 122], np.full(n_vid, 121),
                          [5, 6]]).astype(np.int32)[None]
    from wedetect_tpu.nn.qwen3vl import get_rope_index_single_video
    pos = get_rope_index_single_video(
        ids[0], 121, gt, gh, gw, 2)[:, None]
    params = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(patches), jnp.asarray(ids),
        jnp.ones_like(ids), jnp.asarray(pos),
        jnp.asarray(np.array([[0, 0, 96, 64]], np.float32)),
        jnp.asarray(np.array([96.0, 64.0], np.float32)), 2,
        jnp.zeros((1, 1), jnp.int32))["params"]

    scorer = RefScorer(cfg=cfg, params=params, tokenizer=Tok())
    text = scorer.generate_video_text(gif, "describe the clip",
                                      max_new_tokens=4,
                                      eos_token_id=95, pad_token_id=0)
    assert isinstance(text, str) and text


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
