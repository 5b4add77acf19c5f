"""Detector training loop: data pipeline -> jitted step -> checkpoints.

The reference ships the loss path but no train launcher (SURVEY.md §0);
this is the TPU-native runner: host-side augmentation workers feed a
device-sharded global batch; BN stats and gradients reduce over the
mesh inside one jit (train_step); orbax checkpoints every
`ckpt_every` steps.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import time
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from wedetect_tpu.configs import ModelCfg
from wedetect_tpu.train.train_step import Batch, TrainState, train_step


@dataclasses.dataclass
class TrainLoopCfg:
    steps: int = 1000
    batch_size: int = 16
    log_every: int = 50
    ckpt_every: int = 1000
    ckpt_dir: Optional[str] = None
    mosaic_prob: float = 0.0
    mixup_prob: float = 0.0
    # jax.profiler trace: dump a trace of steps
    # [profile_start, profile_start + profile_steps) to profile_dir
    profile_dir: Optional[str] = None
    profile_start: int = 20
    profile_steps: int = 5


def make_batch_iterator(cfg: ModelCfg, loop_cfg: TrainLoopCfg,
                        sample_fn: Callable[[np.random.Generator], Dict],
                        text_embed_fn: Callable[[Sequence[str]],
                                                np.ndarray],
                        seed: int = 0,
                        num_workers: int = 8) -> Iterator[Batch]:
    """Builds static-shape Batches from host samples.

    sample_fn(rng) -> {image (HWC u8 at cfg.img_size), gt_bboxes,
    gt_labels, texts (list of prompt strings)}; text embeddings are
    computed per batch (or cached by the caller inside text_embed_fn).
    """
    h, w = cfg.img_size
    g = cfg.train.max_gt_per_image

    def build_one(rng: np.random.Generator) -> Dict:
        from wedetect_tpu.data.augment import (merge_mixed_texts,
                                               mixup2, mosaic4)

        s = sample_fn(rng)
        if loop_cfg.mosaic_prob and rng.uniform() < loop_cfg.mosaic_prob:
            import cv2

            # remap every part's labels into the union text list
            # BEFORE mixing (reference _update_label_text semantics)
            parts = [s] + [sample_fn(rng) for _ in range(3)]
            union, parts = merge_mixed_texts(parts)
            m = mosaic4(parts, img_scale=max(h, w) // 2, rng=rng)
            img = cv2.resize(m["image"], (w, h),
                             interpolation=cv2.INTER_LINEAR)
            r = w / m["image"].shape[1]
            s = {"image": img, "gt_bboxes": m["gt_bboxes"] * r,
                 "gt_labels": m["gt_labels"], "texts": union}
        if loop_cfg.mixup_prob and rng.uniform() < loop_cfg.mixup_prob:
            other = sample_fn(rng)
            union, (s2, other) = merge_mixed_texts([s, other])
            s = mixup2(s2, other, rng)
            s["texts"] = union
        return s

    rng0 = np.random.default_rng(seed)
    # no context manager: an abandoned generator would run the pool's
    # __exit__ during interpreter teardown and crash in threading
    pool = cf.ThreadPoolExecutor(num_workers)
    while True:
        seeds = rng0.integers(0, 2**31, loop_cfg.batch_size)
        futs = [pool.submit(build_one, np.random.default_rng(int(sd)))
                for sd in seeds]
        samples = [f.result() for f in futs]
        images = np.stack([s["image"] for s in samples])
        gtb = np.zeros((len(samples), g, 4), np.float32)
        gtl = np.zeros((len(samples), g), np.int32)
        gtm = np.zeros((len(samples), g), bool)
        # per-sample text banks: every sample carries its OWN
        # (shuffled, sampled) class list, so embeddings must be
        # per-row (B, K, C) — sharing row 0's bank would score
        # other rows' labels against the wrong classes. K is the
        # STATIC config class count (a varying K would recompile
        # the train graph); gts whose labels exceed it are dropped
        # (the reference's RandomLoadText unsampled-class
        # behavior).
        k_max = cfg.num_classes
        embs = []
        for i, s in enumerate(samples):
            texts = list(s.get("texts") or [])
            labels = np.asarray(s["gt_labels"])
            boxes = np.asarray(s["gt_bboxes"]).reshape(-1, 4)
            keep = labels < k_max
            labels, boxes = labels[keep], boxes[keep]
            n = min(len(boxes), g)
            gtb[i, :n] = boxes[:n]
            gtl[i, :n] = labels[:n]
            gtm[i, :n] = True
            texts = (texts + [""] * k_max)[:k_max]
            embs.append(text_embed_fn(texts))
        w_emb = np.stack(embs)            # (B, K, C)
        yield Batch(images=images, texts=w_emb, gt_bboxes=gtb,
                    gt_labels=gtl, gt_mask=gtm)


def run_training(cfg: ModelCfg, state: TrainState,
                 batches: Iterator[Batch], loop_cfg: TrainLoopCfg,
                 mesh=None,
                 log_fn: Callable[[int, Dict], None] = None
                 ) -> TrainState:
    from wedetect_tpu.parallel.mesh import shard_batch

    t0 = time.time()
    window: List[float] = []
    start = int(state.step)  # nonzero after a resume
    for step in range(start, loop_cfg.steps):
        if loop_cfg.profile_dir is not None:
            import jax

            if step == loop_cfg.profile_start:
                jax.profiler.start_trace(loop_cfg.profile_dir)
            elif step == loop_cfg.profile_start + loop_cfg.profile_steps:
                jax.profiler.stop_trace()
        batch = next(batches)
        if mesh is not None:
            batch = Batch(*shard_batch(mesh, tuple(batch)))
        state, metrics = train_step(cfg, state, batch)
        # keep the loss as a device scalar — converting here would
        # synchronize every step and serialize host data building
        # against device compute
        window.append(metrics["loss"])
        if (step + 1) % loop_cfg.log_every == 0:
            msg = {
                "step": step + 1,
                "loss": float(np.mean([float(x) for x in window])),
                "num_pos": float(metrics["num_pos"]),
                "img_per_s": loop_cfg.log_every
                * batch.images.shape[0] / max(time.time() - t0, 1e-9),
            }
            (log_fn or (lambda s, m: print(m, flush=True)))(step, msg)
            window.clear()
            t0 = time.time()
        if (loop_cfg.ckpt_dir
                and (step + 1) % loop_cfg.ckpt_every == 0):
            from wedetect_tpu.ckpt.io import save_train_state

            save_train_state(f"{loop_cfg.ckpt_dir}/step_{step + 1}",
                             state)
    return state
