"""Parity: JAX Qwen3-VL vision/text towers vs HF torch on a tiny config."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from wedetect_tpu.ckpt.convert_ref import (convert_embedder,  # noqa: E402
                                           convert_text, convert_vision)
from wedetect_tpu.nn.qwen3vl import (Embedder, RefCfg,  # noqa: E402
                                     RefTextCfg, RefVisionCfg, TextModel,
                                     VisionModel,
                                     get_rope_index_single_image)


@pytest.fixture(scope="module")
def tiny_hf():
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLConfig, Qwen3VLTextConfig, Qwen3VLVisionConfig)

    vision = dict(depth=4, hidden_size=32, num_heads=4,
                  intermediate_size=64, patch_size=4,
                  temporal_patch_size=2, in_channels=3,
                  spatial_merge_size=2, out_hidden_size=48,
                  num_position_embeddings=64,
                  deepstack_visual_indexes=[1, 2])
    text = dict(vocab_size=128, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                head_dim=16, intermediate_size=96,
                rope_theta=1000.0, max_position_embeddings=512,
                rope_scaling={"rope_type": "default",
                              "mrope_section": [4, 2, 2],
                              "mrope_interleaved": True})
    cfg = Qwen3VLConfig(vision_config=vision, text_config=text,
                        image_token_id=120, video_token_id=121,
                        vision_start_token_id=122)
    torch.manual_seed(0)
    model = transformers.Qwen3VLModel(cfg)
    model.eval()
    return cfg, model


def test_vision_parity(tiny_hf, rng):
    hf_cfg, model = tiny_hf
    cfg = RefCfg.from_hf_config(hf_cfg)
    gh, gw = 8, 12  # patch grid (divisible by merge 2)
    s = gh * gw
    patches = rng.standard_normal(
        (s, 3 * 2 * 4 * 4)).astype(np.float32)
    with torch.no_grad():
        want, want_taps = model.visual(
            torch.tensor(patches),
            torch.tensor([[1, gh, gw]], dtype=torch.long))
    sd = {"model.visual." + k: v.numpy()
          for k, v in model.visual.state_dict().items()}
    params = convert_vision(sd, cfg)
    got, taps = VisionModel(cfg.vision, grid_h=gh, grid_w=gw).apply(
        {"params": params}, jnp.asarray(patches))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-4)
    assert len(taps) == len(want_taps) == 2
    for g, w in zip(taps, want_taps):
        np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_text_parity_with_mrope_and_deepstack(tiny_hf, rng):
    hf_cfg, model = tiny_hf
    cfg = RefCfg.from_hf_config(hf_cfg)
    b, l, v = 2, 20, 6  # visual span of 6 tokens at offset 4
    embeds = rng.standard_normal((b, l, 48)).astype(np.float32)
    mask = np.ones((b, l), np.int64)
    mask[1, -4:] = 0
    pos = np.stack([
        get_rope_index_single_image(
            np.where((np.arange(l) >= 4) & (np.arange(l) < 10),
                     120, 0), 120, 4, 6, 2)
        for _ in range(b)], axis=1)  # (3, B, L)
    ds = [rng.standard_normal((v, 48)).astype(np.float32)
          for _ in range(2)]
    vis_mask = np.zeros((b, l), bool)
    vis_mask[:, 4:10] = True
    with torch.no_grad():
        want = model.language_model(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos),
            visual_pos_masks=torch.tensor(vis_mask),
            deepstack_visual_embeds=[
                torch.tensor(np.concatenate([d, d]))
                for d in ds],
        ).last_hidden_state
    sd = {"model.language_model." + k: v.numpy()
          for k, v in model.language_model.state_dict().items()}
    params = convert_text(sd, cfg)
    got = TextModel(cfg.text).apply(
        {"params": params}, jnp.asarray(embeds), jnp.asarray(pos),
        jnp.asarray(mask),
        deepstack_embeds=[jnp.asarray(d) for d in ds],
        visual_start=4)
    g, w = np.asarray(got), want.numpy()
    # only compare positions the padding mask keeps (padded rows
    # differ: HF masks them inside attention the same way, so compare
    # everything where mask==1)
    np.testing.assert_allclose(g[mask.astype(bool)],
                               w[mask.astype(bool)],
                               rtol=3e-4, atol=3e-4)


def test_embedder_parity(tiny_hf, rng):
    hf_cfg, model = tiny_hf
    cfg = RefCfg.from_hf_config(hf_cfg)
    ids = rng.integers(0, 128, (2, 9))
    with torch.no_grad():
        want = model.language_model.embed_tokens(
            torch.tensor(ids)).numpy()
    sd = {"model.language_model." + k: v.numpy()
          for k, v in model.language_model.state_dict().items()}
    got = Embedder(cfg.text).apply(
        {"params": convert_embedder(sd)},
        jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_rope_index_matches_hf(tiny_hf):
    hf_cfg, model = tiny_hf
    gh, gw = 4, 6
    n_img = (gh // 2) * (gw // 2)
    ids = np.concatenate([
        np.array([1, 2, 3, 122]),          # text + vision_start
        np.full(n_img, 120),               # image tokens
        np.array([5, 6, 7]),
    ])
    with torch.no_grad():
        want, _ = model.get_rope_index(
            torch.tensor(ids[None]),
            torch.tensor([[1, gh, gw]], dtype=torch.long), None, None)
    got = get_rope_index_single_image(ids, 120, gh, gw, 2)
    np.testing.assert_array_equal(got, want[:, 0].numpy())

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
