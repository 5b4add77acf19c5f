"""Preprocessing parity vs the HuggingFace Qwen2VL image processor —
the exact component the reference drives through AutoProcessor
(/root/reference/infer_wedetect_ref.py:59,99) — on a REAL JPEG
(/root/reference/assets/demo.jpeg), at production geometry
(patch=16, temporal=2, merge=2, mean/std=0.5).

Three layers:
- grid choice: our smart_resize picks the same (h, w) the HF
  processor resizes to (same algorithm, reference
  wedetect_ref/models/vision_process.py:56-82).
- patchify+normalize: bit-level row ordering and values on shared
  pre-resized pixels.
- the FULL pipeline including resampling: image_to_patches' default
  resample="pil" is the processor's own PIL-BICUBIC path, so raw
  image -> patches matches the HF processor bit-for-bit (round-2's
  cv2 deviation is closed; cv2 remains as an opt-in fast mode).
"""

import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available

pytest.importorskip("transformers")
from transformers.models.qwen2_vl.image_processing_qwen2_vl import (  # noqa: E402,E501
    Qwen2VLImageProcessor)

from wedetect_tpu.data.vision_process import (image_to_patches,  # noqa: E402
                                              smart_resize)

DEMO = os.path.join(REFERENCE_DIR, "assets", "demo.jpeg")

pytestmark = pytest.mark.skipif(not (reference_available()
                                     and os.path.isfile(DEMO)),
                                reason="reference/demo.jpeg not mounted")

MAX_TOKENS = 1024  # bound the grid so the test stays fast


def _processor():
    return Qwen2VLImageProcessor(
        patch_size=16, temporal_patch_size=2, merge_size=2,
        image_mean=[0.5] * 3, image_std=[0.5] * 3,
        min_pixels=4 * 32 * 32, max_pixels=MAX_TOKENS * 32 * 32)


def test_smart_resize_matches_hf_grid():
    from PIL import Image

    img = Image.open(DEMO).convert("RGB")
    out = _processor()(images=[img], return_tensors="np")
    t, gh, gw = out["image_grid_thw"][0]
    assert t == 1
    hb, wb = smart_resize(img.height, img.width, 32,
                          min_pixels=4 * 32 * 32,
                          max_pixels=MAX_TOKENS * 32 * 32)
    assert (int(gh) * 16, int(gw) * 16) == (hb, wb)


def test_patchify_matches_hf_processor():
    from PIL import Image

    img = Image.open(DEMO).convert("RGB")
    hb, wb = smart_resize(img.height, img.width, 32,
                          min_pixels=4 * 32 * 32,
                          max_pixels=MAX_TOKENS * 32 * 32)
    resized = img.resize((wb, hb), Image.Resampling.BICUBIC)

    proc = _processor()
    proc.do_resize = False
    want = proc(images=[resized], return_tensors="np")
    arr = np.asarray(resized)
    got, gh, gw = image_to_patches(arr, patch=16, temporal_patch=2,
                                   merge=2)
    assert [1, gh, gw] == list(want["image_grid_thw"][0])
    assert got.shape == want["pixel_values"].shape
    np.testing.assert_allclose(got, want["pixel_values"], rtol=1e-6,
                               atol=1e-6)


def test_full_pipeline_matches_hf_processor():
    """Raw image -> patches, resampling INCLUDED (do_resize=True on
    the HF side, image_to_patches' default resample='pil' on ours)."""
    from PIL import Image

    img = Image.open(DEMO).convert("RGB")
    want = _processor()(images=[img], return_tensors="np")
    got, gh, gw = image_to_patches(
        np.asarray(img), patch=16, temporal_patch=2, merge=2,
        min_pixels=4 * 32 * 32, max_pixels=MAX_TOKENS * 32 * 32)
    assert [1, gh, gw] == list(want["image_grid_thw"][0])
    np.testing.assert_allclose(got, want["pixel_values"], rtol=1e-6,
                               atol=1e-6)
