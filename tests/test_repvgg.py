"""RepVGGBlock train/deploy equivalence."""

import numpy as np

import jax
import jax.numpy as jnp

from wedetect_tpu.nn.layers import RepVGGBlock, repvgg_fuse


def test_repvgg_fuse(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16),
                                        dtype=np.float32))
    blk = RepVGGBlock(16)
    variables = blk.init(jax.random.PRNGKey(0), x)
    # randomize BN stats
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: jnp.asarray(
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32)),
            variables["batch_stats"]),
    }
    want = blk.apply(variables, x)
    fused = repvgg_fuse(variables["params"],
                        variables["batch_stats"])
    got = RepVGGBlock(16, deploy=True).apply({"params": fused}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_repvgg_stride2_no_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16),
                                        dtype=np.float32))
    blk = RepVGGBlock(32, stride=2)
    variables = blk.init(jax.random.PRNGKey(0), x)
    assert "rbr_identity" not in variables["params"]
    y = blk.apply(variables, x)
    assert y.shape == (1, 4, 4, 32)
    fused = repvgg_fuse(variables["params"],
                        variables["batch_stats"])
    got = RepVGGBlock(32, stride=2, deploy=True).apply(
        {"params": fused}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y),
                               rtol=2e-4, atol=2e-4)
