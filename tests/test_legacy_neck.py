"""Shape/behavior tests for the legacy text-guided neck family.

(The reference implementations live behind mmcv/mmdet imports that are
not installable here; semantics were transcribed from the source —
yolo_bricks.py — and validated structurally.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wedetect_tpu.nn.yolo_world_pafpn import (
    CSPLayerWithTwoConv, ImagePoolingAttentionModule,
    MaxSigmoidAttnBlock, MaxSigmoidCSPLayerWithTwoConv, YOLOWorldPAFPN,
    _adaptive_max_pool)


def init_apply(mod, *args):
    variables = mod.init(jax.random.PRNGKey(0), *args)
    return mod.apply(variables, *args)


def test_csp_two_conv(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32),
                                        dtype=np.float32))
    y = init_apply(CSPLayerWithTwoConv(48, num_blocks=2), x)
    assert y.shape == (2, 8, 8, 48)


def test_max_sigmoid_attn(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32),
                                        dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((2, 5, 64), dtype=np.float32))
    y = init_apply(MaxSigmoidAttnBlock(32, 16, num_heads=2), x, g)
    assert y.shape == (2, 8, 8, 32)
    # gating: zero guide -> sigmoid(bias=0) = 0.5 exactly
    y0 = init_apply(MaxSigmoidAttnBlock(32, 16, num_heads=2), x,
                    jnp.zeros((2, 5, 64)))
    assert np.isfinite(np.asarray(y0)).all()


def test_max_sigmoid_csp(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64),
                                        dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((1, 7, 96), dtype=np.float32))
    y = init_apply(MaxSigmoidCSPLayerWithTwoConv(
        64, 32, num_heads=2, num_blocks=2), x, g)
    assert y.shape == (1, 8, 8, 64)


def test_adaptive_max_pool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 10, 13, 4)).astype(np.float32)
    want = torch.nn.AdaptiveMaxPool2d((3, 3))(
        torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(
            0, 2, 3, 1)
    got = np.asarray(_adaptive_max_pool(jnp.asarray(x), 3))
    np.testing.assert_allclose(got, want)


def test_image_pooling_attention(rng):
    feats = [jnp.asarray(rng.standard_normal((2, s, s, c),
                                             dtype=np.float32))
             for s, c in ((16, 32), (8, 64), (4, 128))]
    text = jnp.asarray(rng.standard_normal((2, 6, 48),
                                           dtype=np.float32))
    y = init_apply(ImagePoolingAttentionModule(
        text_ch=48, embed_ch=64, num_heads=4), text, feats)
    assert y.shape == (2, 6, 48)


def test_yolo_world_pafpn(rng):
    feats = [jnp.asarray(rng.standard_normal((1, s, s, c),
                                             dtype=np.float32))
             for s, c in ((16, 64), (8, 128), (4, 256))]
    text = jnp.asarray(rng.standard_normal((1, 5, 96),
                                           dtype=np.float32))
    for dual in (False, True):
        neck = YOLOWorldPAFPN(out_channels=(64, 128, 256),
                              embed_channels=(32, 64, 128),
                              num_heads=(2, 4, 8), num_csp_blocks=1,
                              dual=dual)
        outs = init_apply(neck, feats, text)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256)]


def test_efficient_csp(rng):
    from wedetect_tpu.nn.yolo_world_pafpn import (
        EfficientCSPLayerWithTwoConv)

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32),
                                        dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((1, 4, 64), dtype=np.float32))
    y = init_apply(EfficientCSPLayerWithTwoConv(32, num_blocks=1), x, g)
    assert y.shape == (1, 8, 8, 32)


def test_yolov5_pafpn_shapes():
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.nn.yolo_world_pafpn import YOLOv5PAFPN

    neck = YOLOv5PAFPN(channels=(64, 128, 256), num_csp_blocks=1)
    feats = [jnp.zeros((2, 32, 32, 64)), jnp.zeros((2, 16, 16, 128)),
             jnp.zeros((2, 8, 8, 256))]
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert [o.shape for o in outs] == [(2, 32, 32, 64),
                                       (2, 16, 16, 128),
                                       (2, 8, 8, 256)]


def test_yolov8_pafpn_shapes():
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.nn.yolo_world_pafpn import YOLOv8PAFPN

    neck = YOLOv8PAFPN(out_channels=(64, 128, 256), num_csp_blocks=1)
    feats = [jnp.zeros((2, 32, 32, 64)), jnp.zeros((2, 16, 16, 128)),
             jnp.zeros((2, 8, 8, 256))]
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert [o.shape for o in outs] == [(2, 32, 32, 64),
                                       (2, 16, 16, 128),
                                       (2, 8, 8, 256)]
