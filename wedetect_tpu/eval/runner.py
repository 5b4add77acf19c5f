"""Distributed COCO/LVIS evaluation runner.

Behavioral spec: reference test.py:67-146 + dist_test.sh (mmengine
TestLoop with per-rank DefaultSampler, CocoMetric/LVISMetric on rank 0)
and eval_recall/eval_recall.py:1458-1588 (InferenceSampler contiguous
shards + all_gather_object).

TPU-native: per-process contiguous index shard via jax.process_index,
batched device inference (the reference runs bs=1; batching is a free
throughput win), host-side metric accumulation, and a
multihost_utils.process_allgather merge when running multi-host.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import numpy as np

from wedetect_tpu.configs import ModelCfg
from wedetect_tpu.data.coco import CocoDetDataset
from wedetect_tpu.data.loader import EvalLoader
from wedetect_tpu.eval.coco_map import CocoEvaluator
from wedetect_tpu.models.wedetect import detect_step


def process_shard(n: int, rank: Optional[int] = None,
                  world: Optional[int] = None) -> range:
    """Contiguous index shard (InferenceSampler semantics)."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    per = (n + world - 1) // world
    return range(rank * per, min((rank + 1) * per, n))


def evaluate_coco(cfg: ModelCfg, variables, ds: CocoDetDataset,
                  text_embeds, batch_size: int = 8,
                  class_mask=None, max_images: Optional[int] = None,
                  progress: bool = False,
                  lvis: bool = False,
                  tta: bool = False,
                  dump_path: Optional[str] = None) -> Dict[str, float]:
    """Run the detector over the dataset and compute COCO (or LVIS
    fixed-AP) bbox metrics. tta=True adds the horizontal-flip view
    and merges per DetTTAModel semantics (reference test.py --tta).
    dump_path writes every image's raw predictions (boxes/scores/
    labels/embeds, eval/dump.py layout) — the DumpDetResults role
    (reference test.py:29,143); multi-host, rank 0 writes the merged
    dump."""
    import jax.numpy as jnp

    from wedetect_tpu.models.wedetect import detect_step_tta
    step = detect_step_tta if tta else detect_step

    indices = list(process_shard(len(ds)))
    if max_images:
        indices = indices[:max_images]
    loader = EvalLoader(ds, cfg.img_size, batch_size=batch_size,
                        indices=indices)
    if lvis:
        from wedetect_tpu.eval.lvis_map import LvisEvaluator

        evaluator = LvisEvaluator(
            class_ids=range(len(ds.class_names)),
            frequencies=getattr(ds, "frequencies", None))
    else:
        evaluator = CocoEvaluator(class_ids=range(len(ds.class_names)))
    w = jnp.asarray(text_embeds) if text_embeds is not None else None

    # pack the four result tensors into ONE device buffer so each
    # batch costs a single device->host readback (each separate
    # readback pays a full transport round trip; measured 503 -> 349
    # ms/batch on the tunneled bench rig, and still one less RPC on
    # local PCIe)
    @functools.partial(jax.jit, static_argnums=(1,))
    def _pack(det, with_embeds):
        import jax.numpy as jnp

        cols = [det.boxes, det.scores[..., None],
                det.labels[..., None].astype(jnp.float32),
                det.valid[..., None].astype(jnp.float32)]
        if with_embeds:
            cols.append(det.embeds.astype(jnp.float32))
        return jnp.concatenate(cols, -1)

    dump_records: List[dict] = []

    def consume(packed, batch):
        packed = np.asarray(packed)
        boxes = packed[..., :4]
        scores = packed[..., 4]
        labels = packed[..., 5].astype(np.int64)
        valid = packed[..., 6].astype(bool)
        for i, idx in enumerate(batch["idxs"]):
            v = valid[i]
            if dump_path is not None:
                dump_records.append({
                    "img_id": ds.items[idx]["img_id"],
                    "boxes": boxes[i][v], "scores": scores[i][v],
                    "labels": labels[i][v],
                    "embeds": packed[i, :, 7:][v]})
            if lvis:
                item = ds.items[idx]
                evaluator.add_image(
                    ds.gt_arrays(idx), boxes[i][v], scores[i][v],
                    labels[i][v],
                    neg_cats=set(item.get("neg_cats", [])),
                    not_exhaustive=set(item.get("not_exhaustive",
                                                [])))
            else:
                evaluator.add_image(ds.gt_arrays(idx), boxes[i][v],
                                    scores[i][v], labels[i][v])

    # lag-1 dispatch pipeline: batch i+1 is loaded and dispatched
    # while batch i's results cross back from the device — hides the
    # per-dispatch round-trip (jax dispatch is async; only the
    # np.asarray readbacks in consume() block)
    pending = None
    for bi, batch in enumerate(loader):
        det = step(
            cfg, variables, jnp.asarray(batch["images"]), w,
            jnp.asarray(batch["scale_factor"]),
            jnp.asarray(batch["pad_param"]),
            jnp.asarray(batch["ori_shape"]), class_mask)
        if pending is not None:
            consume(*pending)
        pending = (_pack(det, dump_path is not None), batch)
        if progress and bi % 20 == 0:
            print(f"eval {bi}/{len(loader)}", flush=True)
    if pending is not None:
        consume(*pending)

    if jax.process_count() > 1:
        # rank-0 merge of per-process match records (the reference's
        # all_gather_object + rank-0 metric pattern)
        from wedetect_tpu.eval.dist import all_gather_object

        all_records = all_gather_object(evaluator._records)
        evaluator._records = [r for part in all_records for r in part]
        if hasattr(evaluator, "_images"):
            # LvisEvaluator matches lazily in summarize() from the
            # buffered per-image inputs (the fixed-AP cap is a
            # DATASET-global top-k, so it must see every rank's
            # detections before matching) — gather those too
            all_images = all_gather_object(evaluator._images)
            evaluator._images = [im for part in all_images
                                 for im in part]
        if dump_path is not None:
            parts = all_gather_object(dump_records)
            dump_records = [r for part in parts for r in part]
    if dump_path is not None and jax.process_index() == 0:
        from wedetect_tpu.eval.dump import save_detections

        save_detections(dump_path, dump_records)
    return evaluator.summarize()
