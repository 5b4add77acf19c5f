"""Conv+BN folding equivalence."""
import pytest

import numpy as np

import jax.numpy as jnp

from test_detector import mini_cfg
from wedetect_tpu.ckpt.fuse import fold_conv_bn
from wedetect_tpu.models.wedetect import forward_raw, init_variables


def test_fold_equivalence(rng):
    cfg = mini_cfg()
    variables = init_variables(cfg, seed=0)
    # randomize BN stats so the fold actually does something
    import jax

    def rand_stats(x):
        r = np.random.default_rng(x.size)
        if x.ndim == 1:
            return jnp.asarray(
                r.uniform(0.5, 1.5, x.shape).astype(np.float32))
        return x

    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        rand_stats, variables["batch_stats"])
    fused = fold_conv_bn(variables)

    imgs = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    w = rng.standard_normal((4, cfg.embed_dims)).astype(np.float32)
    a = forward_raw(cfg, variables, jnp.asarray(imgs), jnp.asarray(w))
    b = forward_raw(cfg, fused, jnp.asarray(imgs), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(a.logits),
                               np.asarray(b.logits), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.boxes),
                               np.asarray(b.boxes), rtol=2e-4,
                               atol=2e-4)
    # BN neutralized
    bn = fused["params"]["neck"]["reduce0"]["bn"]
    np.testing.assert_allclose(np.asarray(bn["scale"]), 1.0)


def test_bake_text_head(rng):
    """Baked 1x1 weights reproduce BN+normalize+scale scoring."""
    import jax

    from wedetect_tpu.ckpt.fuse import bake_text_head
    from wedetect_tpu.nn.head import ContrastiveScore

    cfg_dim, k = 16, 5
    x = jnp.asarray(rng.standard_normal((2, 4, 4, cfg_dim),
                                        dtype=np.float32))
    t = rng.standard_normal((k, cfg_dim)).astype(np.float32)
    mod = ContrastiveScore(cfg_dim)
    variables = mod.init(jax.random.PRNGKey(0), x, jnp.asarray(t))
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: jnp.asarray(np.random.default_rng(v.size)
                                  .uniform(0.5, 1.5, v.shape)
                                  .astype(np.float32)),
            variables["batch_stats"]),
    }
    want, _ = mod.apply(variables, x, jnp.asarray(t))

    fake_vars = {
        "params": {"head": {"contrast0": variables["params"]}},
        "batch_stats": {"head": {"contrast0":
                                 variables["batch_stats"]}},
    }
    baked = bake_text_head(fake_vars, t)["contrast0"]
    got = jnp.einsum("bhwc,kc->bhwk", x, baked["weight"]) + \
        baked["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cov_mse():
    from wedetect_tpu.train.losses import cov_mse_loss

    x = jnp.asarray(np.array([[1.0, 2.0], [3.0, 2.0]], np.float32))
    got = float(cov_mse_loss(x, dim=0))
    std = np.std(np.array([[1, 2], [3, 2]]), axis=0, ddof=1)
    mean = np.mean(np.array([[1, 2], [3, 2]]), axis=0)
    want = float(np.mean((std / mean) ** 2))
    assert got == pytest.approx(want, rel=1e-5)

# heavy golden/e2e file: excluded from the fast tier (pytest.ini)
pytestmark = pytest.mark.slow
