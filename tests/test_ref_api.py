"""RefScorer end-to-end smoke with a fake tokenizer + tiny model."""

import numpy as np
import pytest

from wedetect_tpu.models.ref import RefModules
from wedetect_tpu.models.ref_api import RefScorer, pad_to_bucket
from wedetect_tpu.nn.qwen3vl import RefCfg, RefTextCfg, RefVisionCfg


class FakeTok:
    """Maps each character to a small id; deterministic."""

    def encode(self, text, add_special_tokens=False):
        return [(ord(ch) % 80) + 1 for ch in text][:10]


@pytest.fixture(scope="module")
def tiny():
    import jax

    cfg = RefCfg(
        vision=RefVisionCfg(depth=2, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(0, 1)),
        text=RefTextCfg(vocab_size=256, hidden=48, layers=2, heads=4,
                        kv_heads=2, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=120, vision_start_token_id=122,
        object_token_id=123)
    # init params for a fixed grid (the scorer recompiles per grid,
    # so use an image that lands exactly on this grid)
    gh = gw = 8
    mod = RefModules(cfg, gh, gw)
    rng = np.random.default_rng(0)
    variables = mod.init(
        jax.random.PRNGKey(0),
        np.zeros((gh * gw, 3 * 2 * 4 * 4), np.float32),
        np.zeros((1, 32), np.int32), np.ones((1, 32), np.int32),
        np.zeros((3, 1, 32), np.int32),
        np.zeros((3, 4), np.float32),
        np.array([64.0, 64.0], np.float32), 4,
        np.zeros((1, 3), np.int32))
    return cfg, variables["params"]


def test_pad_to_bucket():
    assert pad_to_bucket(10, (16, 32)) == 16
    assert pad_to_bucket(17, (16, 32)) == 32
    assert pad_to_bucket(99, (16, 32)) == 99


def test_ref_scorer(tiny, monkeypatch):
    cfg, params = tiny
    # patch image_to_patches to produce the fixed grid the params
    # were initialized for (patch 4 instead of 16)
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                       seq_buckets=(64, 128), query_batch=2,
                       max_proposals=3, device_patchify=False)
    img = np.zeros((64, 64, 3), np.uint8)
    props = np.array([[0, 0, 30, 30], [10, 10, 60, 60],
                      [5, 20, 40, 64]], np.float32)
    scores = scorer.score(img, props, ["red box", "dog", "cat"],
                          pad_token_id=0)
    assert scores.shape == (3, 3)
    assert np.isfinite(scores).all()
    assert ((scores > 0) & (scores < 1)).all()
    # batching invariance: single query matches its batched result
    s1 = scorer.score(img, props, ["red box"], pad_token_id=0)
    np.testing.assert_allclose(s1[0], scores[0], rtol=1e-4, atol=1e-5)


def test_prefix_sharing_matches_joint(tiny, monkeypatch):
    """Joint and prefix-sharing scorer paths produce the same scores
    (same math, different factorization — see models/ref.prefill_split)."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    common = dict(cfg=cfg, params=params, tokenizer=FakeTok(),
                  seq_buckets=(64, 128), query_batch=2,
                  max_proposals=3, device_patchify=False)
    img = np.zeros((64, 64, 3), np.uint8)
    props = np.array([[0, 0, 30, 30], [10, 10, 60, 60],
                      [5, 20, 40, 64]], np.float32)
    queries = ["red box", "dog", "cat"]
    joint = RefScorer(prefix_sharing=False, **common).score(
        img, props, queries, pad_token_id=0)
    split = RefScorer(prefix_sharing=True, **common).score(
        img, props, queries, pad_token_id=0)
    np.testing.assert_allclose(split, joint, rtol=1e-5, atol=1e-6)


def test_score_rec_matches_per_image(tiny, monkeypatch):
    """Cross-image REC batching equals per-image scoring."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(int(img.sum()) % 1000)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                       query_batch=2, max_proposals=3,
                       grid_buckets=((32, 32),), device_patchify=False)
    rng = np.random.default_rng(5)
    samples = []
    for i in range(3):   # 3 images -> one full + one padded chunk
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        props = rng.uniform(0, 60, (2 + i % 2, 4)).astype(np.float32)
        props[:, 2:] += props[:, :2]
        samples.append((img, props, f"object {i}"))
    got = scorer.score_rec(samples, pad_token_id=0)
    for (img, props, q), g in zip(samples, got):
        want = scorer.score(img, props, [q], pad_token_id=0)[0]
        np.testing.assert_allclose(g, want, rtol=2e-4, atol=1e-6)


def test_pixels_to_patches_matches_host(tiny):
    """Device-side patchify (models/ref.pixels_to_patches) produces
    the identical patch rows the host pipeline extracts — the
    uint8-pixels H2D path is numerically transparent."""
    cfg, _ = tiny
    import jax.numpy as jnp

    from wedetect_tpu.data.vision_process import image_to_patches
    from wedetect_tpu.models.ref import pixels_to_patches

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    v = cfg.vision
    want, gh, gw = image_to_patches(
        img, patch=v.patch, temporal_patch=v.temporal_patch,
        merge=v.merge, grid_buckets=((32, 32),))
    got = np.asarray(pixels_to_patches(
        jnp.asarray(img), v.patch, v.temporal_patch, v.merge))
    assert got.shape == want.shape == (gh * gw, 3 * 2 * 4 * 4)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_device_patchify_matches_host_path(tiny):
    """RefScorer scores are identical whether patches are extracted
    on host or the scorer ships uint8 pixels for device patchify."""
    cfg, params = tiny
    common = dict(cfg=cfg, params=params, tokenizer=FakeTok(),
                  query_batch=2, max_proposals=3,
                  grid_buckets=((32, 32),))
    img = np.random.default_rng(9).integers(
        0, 255, (64, 48, 3)).astype(np.uint8)
    props = np.array([[0, 0, 30, 30], [10, 10, 60, 44]], np.float32)
    host = RefScorer(device_patchify=False, **common).score(
        img, props, ["dog"], pad_token_id=0)
    dev = RefScorer(device_patchify=True, **common).score(
        img, props, ["dog"], pad_token_id=0)
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_score_multi_images(tiny, monkeypatch):
    """Multi-image conversation scoring: 3 images (middle one context
    only), per-image score blocks; 1-image degenerate case equals the
    single-image joint path (identical token layout)."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(int(img[0, 0, 0]) + 1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                       seq_buckets=(128, 256), query_batch=2,
                       max_proposals=3, device_patchify=False,
                       prefix_sharing=False)
    imgs = [np.full((64, 64, 3), v, np.uint8) for v in (0, 1, 2)]
    props = np.array([[0, 0, 30, 30], [10, 10, 60, 60]], np.float32)
    props2 = np.array([[5, 20, 40, 64]], np.float32)
    out = scorer.score_multi_images(
        imgs, [props, None, props2], ["red box", "dog", "cat"],
        pad_token_id=0)
    assert len(out) == 2                      # proposal-bearing images
    assert out[0].shape == (3, 2) and out[1].shape == (3, 1)
    for blk in out:
        assert np.isfinite(blk).all()
        assert ((blk > 0) & (blk < 1)).all()

    # 1-image degenerate case: same layout as the single-image path
    single = scorer.score(imgs[0], props, ["red box"], pad_token_id=0)
    multi = scorer.score_multi_images(imgs[:1], [props], ["red box"],
                                      pad_token_id=0)
    np.testing.assert_allclose(multi[0], single[:, :2], rtol=1e-4,
                               atol=1e-5)


def test_generate_text(tiny, monkeypatch):
    """Chat generation through the RefScorer surface (tiny model,
    fake tokenizer): returns token list (no decode on FakeTok)."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                       max_proposals=3, device_patchify=False)
    img = np.zeros((64, 64, 3), np.uint8)
    out = scorer.generate_text(img, "describe the image",
                               max_new_tokens=4, eos_token_id=95,
                               pad_token_id=0)
    assert isinstance(out, list) and len(out) <= 4
    assert all(0 <= t < cfg.text.vocab_size for t in out)

    # the DEFAULT device_patchify=True path ships raw uint8 pixels
    # into the prefill (regression: the prefill must carry the
    # pixels_to_patches guard like every other vision entry point)
    def fake_pixels(img, **kw):
        return np.zeros((32, 32, 3), np.uint8), 8, 8

    monkeypatch.setattr(vp, "image_to_pixels", fake_pixels)
    scorer2 = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                        max_proposals=3)
    out2 = scorer2.generate_text(img, "describe the image",
                                 max_new_tokens=4, eos_token_id=95,
                                 pad_token_id=0)
    assert isinstance(out2, list) and len(out2) <= 4

    # quantize_decode=True builds the int8 decode tree lazily and
    # generates valid tokens through the same surface
    scorer3 = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                        max_proposals=3, device_patchify=False,
                        quantize_decode=True)
    out3 = scorer3.generate_text(img, "describe the image",
                                 max_new_tokens=4, eos_token_id=95,
                                 pad_token_id=0)
    assert scorer3._decode_params is not None
    assert isinstance(out3, list) and len(out3) <= 4
    assert all(0 <= t < cfg.text.vocab_size for t in out3)


def test_score_multi_images_prefix_sharing(tiny, monkeypatch):
    """Multi-image prefix-sharing factoring equals the joint path."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(int(img[0, 0, 0]) + 1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    common = dict(cfg=cfg, params=params, tokenizer=FakeTok(),
                  seq_buckets=(256, 512), query_batch=2,
                  max_proposals=3, device_patchify=False,
                  suffix_buckets=(64, 128))
    imgs = [np.full((64, 64, 3), v, np.uint8) for v in (0, 1)]
    props = np.array([[0, 0, 30, 30], [10, 10, 60, 60]], np.float32)
    props2 = np.array([[5, 20, 40, 64]], np.float32)
    queries = ["red box", "dog", "cat"]
    joint = RefScorer(prefix_sharing=False, **common)
    split = RefScorer(prefix_sharing=True, **common)
    a = joint.score_multi_images(imgs, [props, props2], queries,
                                 pad_token_id=0)
    b = split.score_multi_images(imgs, [props, props2], queries,
                                 pad_token_id=0)
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-5)


def test_score_multi_images_all_context(tiny, monkeypatch):
    """Every image context-only (all proposals None) must not crash
    (empty object concat) and returns no score blocks."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(int(img[0, 0, 0]) + 1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    for sharing in (False, True):
        scorer = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                           seq_buckets=(256,), max_proposals=3,
                           device_patchify=False,
                           suffix_buckets=(64,),
                           prefix_sharing=sharing)
        imgs = [np.full((64, 64, 3), v, np.uint8) for v in (0, 1)]
        out = scorer.score_multi_images(imgs, [None, None], ["a"],
                                        pad_token_id=0)
        assert out == []


def test_quant_prefill_tracks_float(tiny, monkeypatch):
    """RefScorer(quant_prefill=True): the dynamic-int8 prefill
    (RefCfg.quant_int8 -> ops/int8.py) must track the float scorer and
    preserve per-query proposal ranking on the tiny config."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    common = dict(cfg=cfg, params=params, tokenizer=FakeTok(),
                  seq_buckets=(64, 128), query_batch=2,
                  max_proposals=3, device_patchify=False)
    img = np.zeros((64, 64, 3), np.uint8)
    props = np.array([[0, 0, 30, 30], [10, 10, 60, 60],
                      [5, 20, 40, 64]], np.float32)
    f = RefScorer(**common).score(img, props, ["red box", "dog"],
                                  pad_token_id=0)
    q = RefScorer(quant_prefill=True, **common).score(
        img, props, ["red box", "dog"], pad_token_id=0)
    np.testing.assert_allclose(q, f, atol=0.05)
    assert np.array_equal(np.argsort(q, -1), np.argsort(f, -1))


def test_generate_batch_matches_generate_text(tiny, monkeypatch):
    """generate_batch (continuous batching through GenServer, the
    cli/serve_ref surface) must emit, per request, exactly the tokens
    generate_text (per-request jitted decode) emits — more requests
    than slots, varied prompt lengths."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                       max_proposals=3, device_patchify=False)
    img = np.zeros((64, 64, 3), np.uint8)
    prompts = ["a", "bb", "ccc", "dddd", "eeeee"]
    want = [scorer.generate_text(img, p, max_new_tokens=5,
                                 eos_token_id=95, pad_token_id=0)
            for p in prompts]
    got = scorer.generate_batch([(img, p) for p in prompts],
                                max_new_tokens=5, eos_token_id=95,
                                pad_token_id=0, slots=2, chunk=2)
    assert got == want


def test_generate_batch_sampling_reproducible(tiny, monkeypatch):
    """temperature > 0 through generate_batch: request i samples with
    seed + i (models/serve._sample_rows), so the same batch re-run
    with different slots/chunk is byte-identical, and distinct seeds
    change the streams."""
    cfg, params = tiny
    import wedetect_tpu.data.vision_process as vp

    def fake_patches(img, **kw):
        rng = np.random.default_rng(1)
        return rng.standard_normal(
            (64, 3 * 2 * 4 * 4)).astype(np.float32), 8, 8

    monkeypatch.setattr(vp, "image_to_patches", fake_patches)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=FakeTok(),
                       max_proposals=3, device_patchify=False)
    img = np.zeros((64, 64, 3), np.uint8)
    prompts = ["a", "bb", "ccc", "dddd"]
    kw = dict(max_new_tokens=5, eos_token_id=95, pad_token_id=0,
              temperature=0.9)
    a = scorer.generate_batch([(img, p) for p in prompts],
                              slots=2, chunk=2, seed=7, **kw)
    b = scorer.generate_batch([(img, p) for p in prompts],
                              slots=3, chunk=3, seed=7, **kw)
    assert a == b
    c = scorer.generate_batch([(img, p) for p in prompts],
                              slots=2, chunk=2, seed=8, **kw)
    assert c != a

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
