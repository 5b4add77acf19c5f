"""CLIP tower parity vs HF torch on tiny configs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from wedetect_tpu.nn.clip import (ClipTextCfg, ClipTextTower,  # noqa: E402
                                  ClipVisionCfg, ClipVisionTower,
                                  convert_clip_text,
                                  convert_clip_vision)


def test_clip_text_parity(rng):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, projection_dim=24,
        eos_token_id=98, bos_token_id=97)
    torch.manual_seed(0)
    model = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    ids = np.array([[97, 5, 9, 98, 0, 0],
                    [97, 11, 12, 13, 14, 98]], np.int64)
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids))
        want = out.text_embeds
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
    cfg = ClipTextCfg(vocab_size=99, hidden=32, layers=2, heads=4,
                      intermediate=64, max_positions=16,
                      projection_dim=24, eos_token_id=98)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_clip_text(sd, cfg)
    got = ClipTextTower(cfg).apply({"params": params},
                                   jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4,
                               atol=3e-4)


def test_clip_vision_parity(rng):
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=8)
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(pixel_values=torch.tensor(
            img.transpose(0, 3, 1, 2)), output_hidden_states=True)
        # reference takes last_hidden_state[:, 0] (no post-LN)
        want = out.last_hidden_state[:, 0].numpy()
    cfg = ClipVisionCfg(hidden=32, layers=2, heads=4, intermediate=64,
                        image_size=32, patch=8)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_clip_vision(sd, cfg)
    got = ClipVisionTower(cfg).apply({"params": params},
                                     jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4,
                               atol=3e-4)

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
