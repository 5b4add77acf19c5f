"""Host input pipeline: decode -> letterbox -> batch, with prefetch.

Replaces the reference's torch DataLoader stack (reference
config/wedetect_base.py:197-211 val_dataloader, datasets/utils.py:8-60
yolow_collate) with a thread-pooled numpy pipeline that keeps the TPU
fed: images are decoded/letterboxed on host threads while the device
runs the previous batch (double buffering happens naturally through
jax's async dispatch).
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from wedetect_tpu.data.coco import CocoDetDataset
from wedetect_tpu.ops.letterbox import preprocess_image


def load_image_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def eval_sample(ds: CocoDetDataset, idx: int, img_size,
                fast_decode: bool = False) -> Dict:
    item = ds.items[idx]
    path = item["path"]
    result = None
    if path.lower().endswith((".jpg", ".jpeg")):
        # fused native decode+letterbox (C++, GIL-released); falls
        # back below on any decode problem. fast_decode engages
        # libjpeg DCT-scaled decode for >=2x downscales (near-exact;
        # see native/__init__.decode_letterbox).
        from wedetect_tpu.native import decode_letterbox

        with open(path, "rb") as f:
            result = decode_letterbox(f.read(), img_size,
                                      fast=fast_decode)
    if result is not None:
        padded, sf, pad, ori = result
    else:
        img = load_image_rgb(path)
        padded, sf, pad, ori = preprocess_image(img, img_size)
    return {
        "image": padded, "scale_factor": sf, "pad_param": pad,
        "ori_shape": np.array(ori, np.float32),
        "img_id": item["img_id"], "idx": idx,
    }


class EvalLoader:
    """Batched, prefetching eval loader over an index shard.

    Pads the final partial batch by repeating the last sample (the
    extra rows carry valid=False downstream via `n_valid`).
    """

    def __init__(self, ds: CocoDetDataset, img_size,
                 batch_size: int = 8, indices: Optional[Sequence[int]]
                 = None, num_workers: int = 8, prefetch: int = 4,
                 fast_decode: bool = False):
        self.ds = ds
        self.img_size = tuple(img_size)
        self.bs = batch_size
        self.indices = list(indices if indices is not None
                            else range(len(ds)))
        self.workers = num_workers
        self.prefetch = prefetch
        self.fast_decode = fast_decode

    def __len__(self):
        return (len(self.indices) + self.bs - 1) // self.bs

    def __iter__(self) -> Iterator[Dict]:
        chunks = [self.indices[i:i + self.bs]
                  for i in range(0, len(self.indices), self.bs)]
        with cf.ThreadPoolExecutor(self.workers) as pool:
            pending: List = []
            it = iter(chunks)

            def submit_next():
                chunk = next(it, None)
                if chunk is None:
                    return
                futs = [pool.submit(eval_sample, self.ds, i,
                                    self.img_size, self.fast_decode)
                        for i in chunk]
                pending.append((chunk, futs))

            for _ in range(self.prefetch):
                submit_next()
            while pending:
                chunk, futs = pending.pop(0)
                submit_next()
                samples = [f.result() for f in futs]
                n = len(samples)
                while len(samples) < self.bs:
                    samples.append(samples[-1])
                yield {
                    "images": np.stack([s["image"] for s in samples]),
                    "scale_factor": np.stack(
                        [s["scale_factor"] for s in samples]),
                    "pad_param": np.stack(
                        [s["pad_param"] for s in samples]),
                    "ori_shape": np.stack(
                        [s["ori_shape"] for s in samples]),
                    "img_ids": [s["img_id"] for s in samples[:n]],
                    "idxs": [s["idx"] for s in samples[:n]],
                    "n_valid": n,
                }
