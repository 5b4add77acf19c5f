"""Parity test: flax TextTower vs HF torch XLMRobertaModel."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from wedetect_tpu.configs import TextCfg  # noqa: E402
from wedetect_tpu.nn.xlmr import TextTower, convert_hf_text_tower  # noqa: E402


def test_text_tower_parity(rng):
    hf_cfg = transformers.XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1)
    torch.manual_seed(0)
    model = transformers.XLMRobertaModel(hf_cfg, add_pooling_layer=False)
    model.eval()
    head = torch.nn.Linear(32, 16)

    ids = np.array([[0, 5, 17, 23, 2, 1, 1, 1],
                    [0, 99, 3, 2, 1, 1, 1, 1],
                    [0, 42, 55, 66, 77, 88, 12, 2]], np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        hs = model(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask)).last_hidden_state
        want = head(hs[:, 0])
        want = torch.nn.functional.normalize(want, dim=-1).numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd["head.weight"] = head.weight.detach().numpy()
    sd["head.bias"] = head.bias.detach().numpy()
    cfg = TextCfg(hidden_size=32, num_layers=2, num_heads=4,
                  intermediate_size=64, vocab_size=120,
                  max_position_embeddings=40, head_out=16)
    params = convert_hf_text_tower(sd, cfg)
    got = TextTower(cfg).apply({"params": params},
                               jnp.asarray(ids.astype(np.int32)),
                               jnp.asarray(mask.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
