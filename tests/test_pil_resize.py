"""data/pil_resize.py is bit-identical to Pillow BICUBIC on uint8.

This is the oracle for the numpy fallback resampler behind
data/vision_process.resize_pil_bicubic (used when Pillow itself is
unavailable); the production default calls Pillow directly, so any
drift here is a real deviation from the HF/Qwen preprocessing the
reference drives (wedetect_ref/models/vision_process.py:107-135).
"""

import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR

from wedetect_tpu.data.pil_resize import resize_bicubic_u8

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

DEMO = os.path.join(REFERENCE_DIR, "assets", "demo.jpeg")


def _pil(img, ow, oh):
    return np.asarray(Image.fromarray(img).resize(
        (ow, oh), Image.Resampling.BICUBIC))


@pytest.mark.parametrize("shape,out", [
    ((97, 143), (96, 64)),      # mild downscale
    ((480, 640), (160, 96)),    # 4x downscale (wide antialias kernel)
    ((64, 64), (96, 128)),      # upscale
    ((231, 311), (160, 231)),   # mixed: W down, H unchanged
    ((50, 50), (640, 480)),     # large upscale
])
def test_bitexact_random(shape, out, rng):
    img = rng.integers(0, 256, shape + (3,)).astype(np.uint8)
    ow, oh = out
    np.testing.assert_array_equal(resize_bicubic_u8(img, ow, oh),
                                  _pil(img, ow, oh))


def test_bitexact_grayscale(rng):
    img = rng.integers(0, 256, (120, 90)).astype(np.uint8)
    np.testing.assert_array_equal(resize_bicubic_u8(img, 64, 96),
                                  _pil(img, 64, 96))


@pytest.mark.skipif(not os.path.isfile(DEMO),
                    reason="reference demo.jpeg not mounted")
def test_bitexact_real_image():
    img = np.asarray(Image.open(DEMO).convert("RGB"))
    for ow, oh in [(480, 640), (1280, 960), (96, 64)]:
        np.testing.assert_array_equal(resize_bicubic_u8(img, ow, oh),
                                      _pil(img, ow, oh))


def test_identity_passthrough(rng):
    img = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    np.testing.assert_array_equal(resize_bicubic_u8(img, 48, 32), img)
