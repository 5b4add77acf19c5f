"""Golden parity tests: JAX modules vs the reference torch modules.

Each test instantiates the reference's standalone torch module
(imported read-only from /root/reference/generate_proposal.py) with
seeded random weights, converts the state dict with
wedetect_tpu.ckpt.convert, and compares activations.
"""

import numpy as np
import pytest

from conftest import load_reference_standalone, reference_available

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wedetect_tpu.ckpt import convert as C  # noqa: E402
from wedetect_tpu.nn.layers import BepC3, BiFusion, ConvBN  # noqa: E402
from wedetect_tpu.nn.convnext import ConvNeXt  # noqa: E402
from wedetect_tpu.nn.bifpan import CSPRepBiFPANNeck  # noqa: E402
from wedetect_tpu.nn.head import WeDetectHead  # noqa: E402

pytestmark = [pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted"), pytest.mark.slow]

TOL = dict(rtol=2e-4, atol=2e-4)


def randomize_(module, seed=0):
    """Fill all params & BN buffers of a torch module with random values."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        if "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif "logit_scale" in k:
            sd[k] = torch.full(v.shape, -1.0) + \
                0.1 * torch.randn(v.shape, generator=g)
        else:
            sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    module.load_state_dict(sd)
    module.eval()
    return module


def flat_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def nchw(x_nhwc):
    return torch.tensor(np.ascontiguousarray(
        np.transpose(x_nhwc, (0, 3, 1, 2))))


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def ref():
    return load_reference_standalone()


def test_convbn_silu(ref, rng):
    m = randomize_(ref.ConvBNSiLU(16, 24, kernel_size=3, stride=2))
    x = rng.standard_normal((2, 10, 10, 16), dtype=np.float32)
    with torch.no_grad():
        want = to_nhwc(m(nchw(x)))
    params, stats = C.convert_convbn(flat_sd(m), "")
    got = ConvBN(24, 3, 2, "silu").apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_bepc3(ref, rng):
    n = 12
    m = randomize_(ref.BepC3(32, 32, n=n, e=0.5))
    x = rng.standard_normal((1, 8, 8, 32), dtype=np.float32)
    with torch.no_grad():
        want = to_nhwc(m(nchw(x)))
    params, stats = C.convert_bepc3(flat_sd(m), "", n)
    got = BepC3(32, n=n).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_bifusion(ref, rng):
    m = randomize_(ref.BiFusion(in_channels=[48, 24], out_channels=32))
    x0 = rng.standard_normal((1, 4, 4, 32), dtype=np.float32)
    x1 = rng.standard_normal((1, 8, 8, 48), dtype=np.float32)
    x2 = rng.standard_normal((1, 16, 16, 24), dtype=np.float32)
    with torch.no_grad():
        want = to_nhwc(m([nchw(x0), nchw(x1), nchw(x2)]))
    params, stats = C.convert_bifusion(flat_sd(m), "")
    got = BiFusion(32).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_convnext_small(ref, rng):
    m = randomize_(ref.ConvNeXt("small"))
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = [to_nhwc(t) for t in m(nchw(x))]
    params = C.convert_convnext(flat_sd(m), "", (3, 3, 27, 3))
    got = ConvNeXt(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)).apply(
        {"params": params}, jnp.asarray(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-3, atol=1e-3)


def test_neck(ref, rng):
    scale = 0.25  # shrink channels for test speed; structure unchanged
    m = randomize_(ref.CSPRepBiFPANNeck(scale))
    cs = [int(c * scale) for c in (128, 256, 512, 1024)]
    feats = [rng.standard_normal((1, s, s, c), dtype=np.float32)
             for s, c in zip((32, 16, 8, 4), cs)]
    with torch.no_grad():
        want = [to_nhwc(t) for t in m([nchw(f) for f in feats])]
    params, stats = C.convert_neck(flat_sd(m), "", repeats=12)
    got = CSPRepBiFPANNeck(scale=scale, repeats=12).apply(
        {"params": params, "batch_stats": stats},
        tuple(jnp.asarray(f) for f in feats))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, **TOL)


def test_head(ref, rng):
    in_ch = (48, 96, 192)
    m = randomize_(ref.YOLOWorldHeadModule(
        embed_dims=64, in_channels=list(in_ch), use_bn_head=True))
    feats = [rng.standard_normal((2, s, s, c), dtype=np.float32)
             for s, c in zip((16, 8, 4), in_ch)]
    k = 7
    w = rng.standard_normal((2, k, 64), dtype=np.float32)
    with torch.no_grad():
        outs = m([nchw(f) for f in feats], torch.tensor(w))
    # reference returns ([logit_l0..l2], [bbox_l0..l2]) via multi_apply
    # in mmdet; the standalone returns tuple of per-level tuples.
    if isinstance(outs[0], tuple):
        logits_t = [o[0] for o in outs]
        dists_t = [o[1] for o in outs]
    else:
        logits_t, dists_t = outs
    want_logits = np.concatenate(
        [t.detach().numpy().transpose(0, 2, 3, 1).reshape(2, -1, k)
         for t in logits_t], axis=1)
    want_dists = np.concatenate(
        [t.detach().numpy().transpose(0, 2, 3, 1).reshape(2, -1, 4)
         for t in dists_t], axis=1)

    params, stats = C.convert_head(flat_sd(m), "")
    out = WeDetectHead(embed_dims=64).apply(
        {"params": params, "batch_stats": stats},
        tuple(jnp.asarray(f) for f in feats), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out.logits), want_logits,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.dists), want_dists,
                               rtol=1e-3, atol=1e-3)


def test_canonicalize_keys():
    sd = {
        "backbone.image_model.model.stages.0.0.dwconv.weight": np.zeros(1),
        "bbox_head.head_module.cls_preds.1.0.conv.weight": np.zeros(1),
        "bbox_head.head_module.cls_preds.1.0.bn.running_mean": np.zeros(1),
        "bbox_head.head_module.cls_preds.1.1.conv.weight": np.zeros(1),
        "bbox_head.head_module.cls_preds.1.1.bn.weight": np.zeros(1),
        "bbox_head.head_module.cls_preds.1.2.weight": np.zeros(1),
        "bbox_head.head_module.cls_contrasts.0.logit_scale": np.zeros(()),
        "bbox_head.head_module.reg_preds.0.0.bn.num_batches_tracked":
            np.zeros(1),
    }
    out = C.canonicalize_torch_keys(sd)
    assert "backbone.stages.0.0.dwconv.weight" in out
    assert "bbox_head.cls_preds.1.0.weight" in out
    assert "bbox_head.cls_preds.1.1.running_mean" in out
    assert "bbox_head.cls_preds.1.3.weight" in out
    assert "bbox_head.cls_preds.1.4.weight" in out
    assert "bbox_head.cls_preds.1.6.weight" in out
    assert "bbox_head.cls_contrasts.0.logit_scale" in out
    assert not any("num_batches_tracked" in k for k in out)
