"""Tensor-parallel Ref sharding: TP output == replicated output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wedetect_tpu.models.ref import RefModules, ref_score_step
from wedetect_tpu.nn.qwen3vl import RefCfg, RefTextCfg, RefVisionCfg
from wedetect_tpu.parallel.mesh import make_tp_mesh, ref_tp_sharding


def _tp_cfg():
    return RefCfg(
        vision=RefVisionCfg(depth=2, hidden=32, heads=4,
                            intermediate=64, patch=4, temporal_patch=2,
                            merge=2, out_hidden=48, num_pos_emb=64,
                            deepstack_idx=(0, 1)),
        text=RefTextCfg(vocab_size=256, hidden=48, layers=2, heads=8,
                        kv_heads=4, head_dim=16, intermediate=96,
                        rope_theta=1000.0, mrope_section=(4, 2, 2)),
        image_token_id=120, vision_start_token_id=122,
        object_token_id=123)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ref_tp_matches_replicated(rng):
    cfg = _tp_cfg()
    gh, gw = 8, 8
    args = (jnp.asarray(rng.standard_normal((gh * gw, 96))
                        .astype(np.float32)),
            jnp.asarray(rng.integers(0, 100, (2, 64)).astype(np.int32)),
            jnp.ones((2, 64), jnp.int32),
            jnp.asarray(np.tile(np.arange(64)[None, None], (3, 2, 1))
                        .astype(np.int32)),
            jnp.asarray(np.array([[1, 1, 30, 40]], np.float32)),
            jnp.asarray(np.array([64.0, 64.0], np.float32)),
            4,
            jnp.asarray(np.array([[50], [50]], np.int32)))
    mod = RefModules(cfg, gh, gw)
    params = mod.init(jax.random.PRNGKey(0), *args)["params"]
    want = np.asarray(mod.apply({"params": params}, *args))

    mesh = make_tp_mesh(data=1, tp=4, devices=jax.devices()[:4])
    # the sharder must column/row-shard the big decoder kernels
    specs = ref_tp_sharding(mesh, params)
    qspec = specs["text"]["layer0"]["q_proj"]["kernel"].spec
    ospec = specs["text"]["layer0"]["o_proj"]["kernel"].spec
    assert qspec == jax.sharding.PartitionSpec(None, "tp")
    assert ospec == jax.sharding.PartitionSpec("tp", None)
    with mesh:
        sharded = jax.device_put(params, specs)
        got = np.asarray(ref_score_step(
            cfg, gh, gw, sharded, args[0], args[1], args[2], args[3],
            args[6], args[4], args[5], args[7]))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ref_tp_generate_matches_replicated(rng):
    """TP-sharded generation (Megatron kernels, vocab-sharded tied
    head, head-sharded KV cache inside the decode scan) emits the
    exact greedy tokens of the replicated run — the multi-chip serving
    layout for models too big for one chip's HBM."""
    from wedetect_tpu.models.ref_generate import ref_generate
    from wedetect_tpu.nn.qwen3vl import get_rope_index_single_image

    cfg = _tp_cfg()
    gh, gw = 8, 8
    n_img = (gh // 2) * (gw // 2)
    ids0 = np.concatenate([
        np.array([1, cfg.vision_start_token_id]),
        np.full(n_img, cfg.image_token_id),
        rng.integers(2, 80, 5)]).astype(np.int32)
    pos0 = get_rope_index_single_image(ids0, cfg.image_token_id,
                                       gh, gw, 2)
    patches = rng.standard_normal(
        (gh * gw, 96)).astype(np.float32)
    ids = ids0[None]
    mask = np.ones((1, len(ids0)), np.int32)
    pos = pos0[:, None]
    boxes = np.array([[0, 0, 64, 64]], np.float32)
    ori = np.array([64.0, 64.0], np.float32)
    mod = RefModules(cfg, gh, gw)
    params = mod.init(
        jax.random.PRNGKey(1), jnp.asarray(patches), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(pos), jnp.asarray(boxes),
        jnp.asarray(ori), 1,
        jnp.zeros((1, 1), jnp.int32))["params"]
    gen_args = (cfg, gh, gw)
    tail = (jnp.asarray(patches), jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pos), 1,
            jnp.asarray(np.array([pos0.max() + 1], np.int32)),
            jnp.asarray(boxes), jnp.asarray(ori), 6)
    want = np.asarray(ref_generate(*gen_args, params, *tail, eos_id=95))

    mesh = make_tp_mesh(data=1, tp=4, devices=jax.devices()[:4])
    with mesh:
        sharded = jax.device_put(params, ref_tp_sharding(mesh, params))
        got = np.asarray(ref_generate(*gen_args, sharded, *tail,
                                      eos_id=95))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ref_tp_serve_matches_replicated(rng):
    """Tensor-parallel continuous-batching serving: a GenServer whose
    params are Megatron-sharded and whose KV pool is pinned sharded
    over the kv-head axis (mesh= kwarg) must emit, per request,
    exactly the replicated server's tokens — greedy AND warped
    sampling (categorical over the vocab-sharded lm head)."""
    from wedetect_tpu.models.serve import GenServer
    from wedetect_tpu.nn.qwen3vl import get_rope_index_single_image

    cfg = _tp_cfg()
    gh, gw = 8, 8
    n_img = (gh // 2) * (gw // 2)
    P = 48
    patches0 = rng.standard_normal((gh * gw, 96)).astype(np.float32)

    def build(tail):
        ids = np.concatenate([
            np.array([1, cfg.vision_start_token_id]),
            np.full(n_img, cfg.image_token_id),
            rng.integers(2, 100, tail)]).astype(np.int32)
        pos = get_rope_index_single_image(ids, cfg.image_token_id,
                                          gh, gw, 2)
        p_ids = np.zeros(P, np.int32)
        p_ids[:len(ids)] = ids
        p_mask = np.zeros(P, np.int32)
        p_mask[:len(ids)] = 1
        p_pos = np.zeros((3, P), np.int32)
        p_pos[:, :len(ids)] = pos
        return p_ids, p_mask, p_pos, int(pos.max()) + 1

    ids0, mask0, pos0, _ = build(5)
    mod = RefModules(cfg, gh, gw)
    params = mod.init(
        jax.random.PRNGKey(1), jnp.asarray(patches0),
        jnp.asarray(ids0[None]), jnp.asarray(mask0[None]),
        jnp.asarray(pos0[:, None]),
        jnp.asarray(np.array([[0, 0, 64, 64]], np.float32)),
        jnp.asarray(np.array([64.0, 64.0], np.float32)), 1,
        jnp.zeros((1, 1), jnp.int32))["params"]
    reqs = [(rng.standard_normal((gh * gw, 96)).astype(np.float32),)
            + build(3 + r) for r in range(4)]

    mesh = make_tp_mesh(data=1, tp=4, devices=jax.devices()[:4])
    sharded = jax.device_put(params, ref_tp_sharding(mesh, params))

    def run(p, kw):
        srv = GenServer(cfg, gh, gw, p, slots=2, prompt_len=P,
                        max_new=5, chunk=2, eos_id=99, pad_id=0, **kw)
        m = {}
        for r, (pt, ids, mask, pos, np0) in enumerate(reqs):
            m[srv.submit(pt, ids, mask, pos, 1, np0, seed=40 + r)] = r
        return {m[rid]: list(t) for rid, t in srv.run().items()}

    for kw in ({}, dict(temperature=0.8, top_k=30, top_p=0.9)):
        want = run(params, kw)
        got = run(sharded, dict(mesh=mesh, **kw))
        assert got == want, (kw, got, want)

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
