"""Conv+BN folding equivalence."""

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
