"""WeDetect-Ref text generation: jitted KV-cache decode.

Self-consistency (greedy decode == teacher-forced joint forward) plus
an end-to-end golden vs the reference stage-1/2 twin's inherited HF
``.generate()`` (qwen3vl_grounding.py:311-379)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wedetect_tpu.models.ref import RefModules
from wedetect_tpu.models.ref_generate import _lm_logits, ref_generate
from wedetect_tpu.nn.qwen3vl import (RefCfg, RefTextCfg, RefVisionCfg,
                                     get_rope_index_single_image)
from wedetect_tpu.train.ref_lm import _hidden_states


def tiny_cfg():
    return RefCfg(
        vision=RefVisionCfg(depth=2, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(0, 1)),
        text=RefTextCfg(vocab_size=96, hidden=48, layers=2, heads=4,
                        kv_heads=2, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=90, vision_start_token_id=91,
        object_token_id=92)


def build_prompt(cfg, gh, gw, tail, rng):
    n_img = (gh // 2) * (gw // 2)
    ids = np.concatenate([
        np.array([1, 91]), np.full(n_img, 90),
        rng.integers(2, 80, tail)]).astype(np.int32)
    pos = get_rope_index_single_image(ids, 90, gh, gw, 2)
    return ids, pos


def test_generate_matches_joint_forward():
    """Greedy KV-cache decode must pick exactly the tokens the
    teacher-forced joint forward would (per row, ragged lengths)."""
    cfg = tiny_cfg()
    gh, gw = 8, 8
    rng = np.random.default_rng(0)
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    ids0, pos0 = build_prompt(cfg, gh, gw, 5, rng)
    ids1, pos1 = build_prompt(cfg, gh, gw, 3, rng)
    p = max(len(ids0), len(ids1))
    ids = np.zeros((2, p), np.int32)
    mask = np.zeros((2, p), np.int32)
    pos = np.zeros((3, 2, p), np.int32)
    for r, (i_r, p_r) in enumerate(((ids0, pos0), (ids1, pos1))):
        ids[r, :len(i_r)] = i_r
        mask[r, :len(i_r)] = 1
        pos[:, r, :len(i_r)] = p_r
    next_pos = np.array([pos0.max() + 1, pos1.max() + 1], np.int32)
    boxes = np.array([[0, 0, 64, 64]], np.float32)
    ori = np.array([64.0, 64.0], np.float32)

    mod = RefModules(cfg, gh, gw)
    variables = mod.init(
        jax.random.PRNGKey(3), jnp.asarray(patches),
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pos),
        jnp.asarray(boxes), jnp.asarray(ori), 2,
        jnp.zeros((2, 1), jnp.int32))
    params = variables["params"]

    max_new = 6
    toks = np.asarray(ref_generate(
        cfg, gh, gw, params, jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), 2,
        jnp.asarray(next_pos), jnp.asarray(boxes), jnp.asarray(ori),
        max_new, eos_id=95, pad_id=0))
    assert toks.shape == (2, max_new)

    # teacher forcing per row on the UNPADDED sequence
    for r, (i_r, _) in enumerate(((ids0, pos0), (ids1, pos1))):
        stopped = False
        seq = i_r.copy()
        for t in range(max_new):
            if stopped:
                assert toks[r, t] == 0      # pad after eos
                continue
            pos_r = get_rope_index_single_image(seq, 90, gh, gw, 2)
            hidden = mod.apply(
                {"params": params}, jnp.asarray(patches),
                jnp.asarray(seq[None]),
                jnp.ones((1, len(seq)), jnp.int32),
                jnp.asarray(pos_r[:, None]), jnp.asarray(boxes),
                jnp.asarray(ori), 2, jnp.full((1, 1), -1, jnp.int32),
                method=_hidden_states)
            want = int(np.argmax(np.asarray(
                _lm_logits(params, hidden[0, -1]))))
            assert int(toks[r, t]) == want, (r, t, toks[r], want)
            seq = np.concatenate([seq, [want]]).astype(np.int32)
            if want == 95:
                stopped = True


def test_generate_temperature_sampling():
    """temperature > 0 draws valid tokens and is rng-deterministic."""
    cfg = tiny_cfg()
    gh = gw = 8
    rng = np.random.default_rng(1)
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    ids0, pos0 = build_prompt(cfg, gh, gw, 4, rng)
    ids = ids0[None]
    mask = np.ones((1, len(ids0)), np.int32)
    pos = pos0[:, None]
    boxes = np.array([[0, 0, 64, 64]], np.float32)
    ori = np.array([64.0, 64.0], np.float32)
    mod = RefModules(cfg, gh, gw)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), jnp.asarray(boxes),
        jnp.asarray(ori), 2, jnp.zeros((1, 1), jnp.int32))
    args = (cfg, gh, gw, variables["params"], jnp.asarray(patches),
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pos), 2,
            jnp.asarray(np.array([pos0.max() + 1], np.int32)),
            jnp.asarray(boxes), jnp.asarray(ori), 5)
    a = np.asarray(ref_generate(*args, eos_id=95, temperature=0.8,
                                rng=jax.random.PRNGKey(7)))
    b = np.asarray(ref_generate(*args, eos_id=95, temperature=0.8,
                                rng=jax.random.PRNGKey(7)))
    c = np.asarray(ref_generate(*args, eos_id=95, temperature=0.8,
                                rng=jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(a, b)
    assert ((a >= 0) & (a < cfg.text.vocab_size)).all()
    assert a.shape == c.shape


@pytest.mark.skipif(
    not __import__("conftest").reference_available(),
    reason="reference not mounted")
def test_generate_matches_reference_hf():
    """Greedy tokens match the reference twin's inherited HF
    .generate() on a tiny random-weights config."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import importlib.util
    import sys
    import types

    from conftest import REFERENCE_DIR

    import transformers  # noqa: F401 — import before stubbing

    # an earlier suite file may have stubbed torchvision WITHOUT
    # roi_align (conftest.load_reference_standalone only provides
    # ops.batched_nms) — merge, don't trust "has ops" (this exact
    # hole failed the test in full-suite order while passing solo)
    from test_ref_model import torch_roi_align_stub

    import importlib.machinery

    tv = sys.modules.get("torchvision")
    if tv is None or not hasattr(tv, "ops"):
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace()
        sys.modules["torchvision"] = tv
    if getattr(tv, "__spec__", None) is None:
        tv.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision", None)
    if not hasattr(tv.ops, "roi_align"):
        tv.ops.roi_align = torch_roi_align_stub
    spec = importlib.util.spec_from_file_location(
        "_ref_qwen_gen", REFERENCE_DIR
        + "/wedetect_ref/models/qwen3vl_grounding.py")
    mod_t = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod_t)

    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLConfig)

    vision = dict(depth=2, hidden_size=32, num_heads=4,
                  intermediate_size=64, patch_size=4,
                  temporal_patch_size=2, in_channels=3,
                  spatial_merge_size=2, out_hidden_size=48,
                  num_position_embeddings=64,
                  deepstack_visual_indexes=[0, 1])
    text = dict(vocab_size=96, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                head_dim=16, intermediate_size=96, rope_theta=1000.0,
                max_position_embeddings=512,
                rope_scaling={"rope_type": "default",
                              "mrope_section": [4, 2, 2],
                              "mrope_interleaved": True})
    hf_cfg = Qwen3VLConfig(vision_config=vision, text_config=text,
                           image_token_id=90, video_token_id=89,
                           vision_start_token_id=91, eos_token_id=95,
                           pad_token_id=0)
    torch.manual_seed(5)
    model = mod_t.Qwen3VLGroundingForConditionalGeneration(hf_cfg)
    model.model.object_token_id = 92   # set externally by the
    model.eval()                       # reference training script
    orig = model.model.generate_coordinate
    model.model.generate_coordinate = (
        lambda fm, device="cpu": orig(fm, device))

    gh, gw = 8, 8
    rng = np.random.default_rng(2)
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    n_img = (gh // 2) * (gw // 2)
    ids = np.concatenate([
        np.array([1, 91]), np.full(n_img, 90),
        np.array([7, 8, 9])]).astype(np.int32)
    max_new = 6
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor(ids[None].astype(np.int64)),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([[1, gh, gw]],
                                        dtype=torch.long),
            bboxes=[[]], ori_shapes=[(64.0, 64.0)],
            max_new_tokens=max_new, do_sample=False)
    want = out[0, len(ids):].numpy()

    from wedetect_tpu.ckpt.convert_ref import convert_ref_model
    cfg = RefCfg.from_hf_config(hf_cfg)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_ref_model(sd, cfg)
    assert "lm_head" in params          # untied head mapped
    pos = get_rope_index_single_image(ids, 90, gh, gw, 2)
    toks = np.asarray(ref_generate(
        cfg, gh, gw, params, jnp.asarray(patches),
        jnp.asarray(ids[None]), jnp.ones((1, len(ids)), jnp.int32),
        jnp.asarray(pos[:, None].astype(np.int32)), 2,
        jnp.asarray(np.array([pos.max() + 1], np.int32)),
        jnp.asarray(np.array([[0, 0, 64, 64]], np.float32)),
        jnp.asarray(np.array([64.0, 64.0], np.float32)),
        max_new, eos_id=95, pad_id=0))[0]
    got = toks[:len(want)]
    np.testing.assert_array_equal(got, want)


def test_generate_bfloat16():
    """dtype=bfloat16 decode with bf16-cast params runs end-to-end
    and emits valid tokens (argmax may legitimately differ from f32
    under bf16 rounding, so only shape/validity is pinned)."""
    cfg = tiny_cfg()
    gh = gw = 8
    rng = np.random.default_rng(4)
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    ids0, pos0 = build_prompt(cfg, gh, gw, 4, rng)
    ids = ids0[None]
    mask = np.ones((1, len(ids0)), np.int32)
    pos = pos0[:, None]
    boxes = np.array([[0, 0, 64, 64]], np.float32)
    ori = np.array([64.0, 64.0], np.float32)
    mod = RefModules(cfg, gh, gw)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), jnp.asarray(boxes),
        jnp.asarray(ori), 2, jnp.zeros((1, 1), jnp.int32))
    params = variables["params"]
    args = (cfg, gh, gw, params, jnp.asarray(patches),
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pos), 2,
            jnp.asarray(np.array([pos0.max() + 1], np.int32)),
            jnp.asarray(boxes), jnp.asarray(ori), 4)
    f32 = np.asarray(ref_generate(*args, eos_id=95))
    bparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    b16 = np.asarray(ref_generate(*args[:3], bparams, *args[4:],
                                  eos_id=95, dtype=jnp.bfloat16))
    assert b16.shape == f32.shape
    assert ((b16 >= 0) & (b16 < cfg.text.vocab_size)).all()


def test_generate_multi_image_matches_single():
    """ref_generate_multi on a 1-image layout reproduces ref_generate
    exactly; a 2-image prompt decodes valid tokens."""
    from wedetect_tpu.models.ref_generate import ref_generate_multi
    from wedetect_tpu.nn.qwen3vl import get_rope_index_multi

    cfg = tiny_cfg()
    gh = gw = 8
    rng = np.random.default_rng(6)
    patches = rng.standard_normal(
        (gh * gw, 3 * 2 * 4 * 4)).astype(np.float32)
    ids0, pos0 = build_prompt(cfg, gh, gw, 4, rng)
    ids = ids0[None]
    mask = np.ones((1, len(ids0)), np.int32)
    pos = pos0[:, None]
    boxes = np.array([[0, 0, 64, 64]], np.float32)
    ori = np.array([64.0, 64.0], np.float32)
    mod = RefModules(cfg, gh, gw)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), jnp.asarray(boxes),
        jnp.asarray(ori), 2, jnp.zeros((1, 1), jnp.int32))
    params = variables["params"]
    next_pos = jnp.asarray(np.array([pos0.max() + 1], np.int32))
    single = np.asarray(ref_generate(
        cfg, gh, gw, params, jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), 2, next_pos,
        jnp.asarray(boxes), jnp.asarray(ori), 5, eos_id=95))
    multi = np.asarray(ref_generate_multi(
        cfg, ((gh, gw),), params, (jnp.asarray(patches),),
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pos),
        (jnp.asarray(boxes),), (jnp.asarray(ori),), (2,), next_pos,
        5, eos_id=95))
    np.testing.assert_array_equal(multi, single)

    # 2-image prompt (different grids), caption-only
    g2 = (4, 8)
    p2 = rng.standard_normal(
        (g2[0] * g2[1], 3 * 2 * 4 * 4)).astype(np.float32)
    n0, n1 = 16, (g2[0] // 2) * (g2[1] // 2)
    ids2 = np.concatenate([[1, 91], np.full(n0, 90), [7, 91],
                           np.full(n1, 90),
                           rng.integers(2, 80, 3)]).astype(np.int32)
    pos2 = get_rope_index_multi(ids2, 90, ((gh, gw), g2), 2)
    toks = np.asarray(ref_generate_multi(
        cfg, ((gh, gw), g2), params,
        (jnp.asarray(patches), jnp.asarray(p2)),
        jnp.asarray(ids2[None]), jnp.ones((1, len(ids2)), jnp.int32),
        jnp.asarray(pos2[:, None].astype(np.int32)),
        (jnp.asarray(boxes), None),
        (jnp.asarray(ori),
         jnp.asarray(np.array([32.0, 16.0], np.float32))),
        (2, 2 + n0 + 2),
        jnp.asarray(np.array([pos2.max() + 1], np.int32)), 5,
        eos_id=95))
    assert toks.shape == (1, 5)
    assert ((toks >= 0) & (toks < cfg.text.vocab_size)).all()

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
