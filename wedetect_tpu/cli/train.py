"""Detector training CLI.

The reference ships only the loss path (no train launcher —
SURVEY.md §0); this launcher trains WeDetect/Uni on COCO-format or
webdataset shards with the TPU-native loop.

    python -m wedetect_tpu.cli.train \
        --ann train.json --img-root imgs --size tiny \
        --steps 5000 --batch-size 16 --class-texts texts.json \
        --ckpt-dir runs/tiny
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="WeDetect TPU training")
    p.add_argument("--size", default="tiny")
    p.add_argument("--ann", default="")
    p.add_argument("--img-root", default="")
    p.add_argument("--wds-shards", default="",
                   help="tar shard glob (alternative to --ann)")
    p.add_argument("--class-texts", default="")
    p.add_argument("--tokenizer", default="xlm-roberta-base")
    p.add_argument("--init-checkpoint", default="",
                   help="torch ckpt to start from")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine", "linear"])
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches per optimizer update")
    p.add_argument("--drop-path", type=float, default=0.0)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest step_* under "
                        "--ckpt-dir (params, opt state, step)")
    p.add_argument("--weight-decay", type=float, default=0.025)
    p.add_argument("--mosaic-prob", type=float, default=0.0)
    p.add_argument("--mixup-prob", type=float, default=0.0)
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--img-size", type=int, default=0,
                   help="override the config input size (e.g. 320)")
    p.add_argument("--ckpt-dir", default="")
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from wedetect_tpu.eval.dist import maybe_initialize

    maybe_initialize()   # join a multihost launch (scripts/dist_test.sh)
    import cv2
    import jax
    import numpy as np

    from wedetect_tpu.configs import get_config
    from wedetect_tpu.data.augment import random_load_text
    from wedetect_tpu.data.coco import CocoDetDataset, load_class_texts
    from wedetect_tpu.data.loader import load_image_rgb
    from wedetect_tpu.models.api import Detector
    from wedetect_tpu.models.wedetect import init_variables
    from wedetect_tpu.ops.letterbox import preprocess_image
    from wedetect_tpu.parallel.mesh import (fsdp_sharding, make_mesh,
                                            replicate_tree)
    from wedetect_tpu.train.loop import (TrainLoopCfg,
                                         make_batch_iterator,
                                         run_training)
    from wedetect_tpu.train.optimizer import (make_lr_schedule,
                                              make_optimizer,
                                              with_grad_accum)
    from wedetect_tpu.train.train_step import TrainState

    extra = ({"img_size": (args.img_size, args.img_size)}
             if args.img_size else {})
    cfg = get_config(args.size, compute_dtype="bfloat16",
                     num_classes=args.num_classes,
                     drop_path_rate=args.drop_path, **extra)
    class_texts = (load_class_texts(args.class_texts)
                   if args.class_texts else None)

    # --- data -----------------------------------------------------------
    if args.wds_shards:
        from wedetect_tpu.data.wds import WdsDetDataset

        wds = WdsDetDataset(args.wds_shards,
                            rank=jax.process_index(),
                            world_size=jax.process_count())

        def raw_sample(rng):
            return wds.next_sample()
    else:
        ds = CocoDetDataset(args.ann, args.img_root, test_mode=False)
        if class_texts is None:
            class_texts = [[n] for n in ds.class_names]

        def raw_sample(rng):
            idx = int(rng.integers(len(ds)))
            item = ds.items[idx]
            g = ds.gt_arrays(idx)
            keep = ~g["iscrowd"]
            return {"image": load_image_rgb(item["path"]),
                    "gt_bboxes": g["boxes"][keep],
                    "gt_labels": g["labels"][keep]}

    # text encoding: tower from checkpoint, else hashed random bank
    if args.init_checkpoint:
        det = Detector.from_torch_checkpoint(
            args.init_checkpoint, args.size,
            tokenizer_path=args.tokenizer, compute_dtype="bfloat16",
            num_classes=args.num_classes)
        variables = det.variables
        text_encode = det.encode_texts
    else:
        variables = init_variables(cfg, seed=args.seed)
        _cache = {}

        def text_encode(texts):
            key = tuple(texts)
            if key not in _cache:
                r = np.random.default_rng(abs(hash(key)) % 2**31)
                e = r.standard_normal(
                    (len(texts), cfg.embed_dims)).astype(np.float32)
                _cache[key] = e / np.linalg.norm(e, -1, keepdims=True)
            return _cache[key]

    def sample_fn(rng):
        s = raw_sample(rng)
        if class_texts is not None:
            s = random_load_text(s, class_texts, rng,
                                 max_num_samples=args.num_classes)
        img, sf, pad, _ = preprocess_image(s["image"], cfg.img_size)
        boxes = np.asarray(s["gt_bboxes"], np.float32).reshape(-1, 4)
        boxes = boxes * np.array([sf[0], sf[1], sf[0], sf[1]])
        boxes[:, 0::2] += pad[2]
        boxes[:, 1::2] += pad[0]
        texts = s.get("texts") or [str(i) for i in
                                   range(args.num_classes)]
        return {"image": img, "gt_bboxes": boxes,
                "gt_labels": s["gt_labels"],
                "texts": texts[:args.num_classes]}

    # --- mesh / state ---------------------------------------------------
    mesh = make_mesh(data=-1, fsdp=args.fsdp)
    schedule = make_lr_schedule(args.lr, args.steps,
                                warmup_steps=args.warmup_steps,
                                schedule=args.lr_schedule)
    tx = with_grad_accum(
        make_optimizer(variables["params"], base_lr=args.lr,
                       weight_decay=args.weight_decay,
                       total_batch_size=args.batch_size,
                       lr_schedule=schedule),
        args.grad_accum)
    state = TrainState.create(variables, tx)
    state = state.replace(
        params=jax.device_put(state.params,
                              fsdp_sharding(mesh, state.params)),
        batch_stats=replicate_tree(mesh, state.batch_stats),
        opt_state=jax.device_put(state.opt_state,
                                 fsdp_sharding(mesh, state.opt_state)))
    if args.resume and args.ckpt_dir:
        from wedetect_tpu.ckpt.io import (latest_checkpoint,
                                          restore_train_state)

        last = latest_checkpoint(args.ckpt_dir)
        if last is not None:
            state = restore_train_state(last, state)
            print(f"resumed from {last} at step {int(state.step)}",
                  flush=True)

    loop_cfg = TrainLoopCfg(
        steps=args.steps, batch_size=args.batch_size,
        ckpt_dir=args.ckpt_dir or None, ckpt_every=args.ckpt_every,
        mosaic_prob=args.mosaic_prob, mixup_prob=args.mixup_prob)
    batches = make_batch_iterator(cfg, loop_cfg, sample_fn,
                                  text_encode, seed=args.seed)
    run_training(cfg, state, batches, loop_cfg, mesh=mesh)


if __name__ == "__main__":
    main()
