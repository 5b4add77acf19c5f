"""Benchmark: WeDetect throughput on one chip.

Prints the headline JSON line IMMEDIATELY after the headline row, then
re-prints an updated line after every completed sub-row — the driver
keeps the last parse, so a mid-run timeout can no longer zero the
record (VERDICT r3 item 1: BENCH_r03 was rc=124/parsed=null). Rows are
ordered required-first (tiny/large/K=1280/int8/ref2b/ref4b/gen/serve,
the r2-era set) and each is gated on a wall-clock budget
(WEDETECT_BENCH_BUDGET seconds, default 2100) using per-row cost
estimates, so the process exits 0 under a driver timeout instead of
being killed mid-compile. `--row NAME` runs a single row.

The headline metric is WeDetect-Base @640, K=80 end-to-end detection
(reference baseline 35.1 FPS, BASELINE.md); the "sub" object carries
the additional driver-captured rows VERDICT r1 item 6 / r2 item 8
asked for:
  - wedetect_tiny_640_img_per_s (baseline 62.5 FPS)
  - wedetect_large_1280_img_per_s (baseline 6.0 FPS)
  - wedetect_base_640_k1280_img_per_s (LVIS-scale vocabulary)
  - ref2b/ref4b_queries_per_s (prefix-sharing batched scoring,
    baselines 6.6 / 5.3 FPS = one query per forward upstream)
  - rec_1q_queries_per_s (the reference's ACTUAL FPS protocol: one
    query per image, via RefScorer.score_rec)
  - e2e_eval_img_per_s (host JPEG decode+letterbox threads feeding
    the device detect step — the dist_test.sh workload)

Every row runs the FULL graph — uint8 input, /255, backbone, neck,
head, contrastive scoring, DFL decode, static NMS (detect rows) /
vision tower + batched LLM prefill + RoIAlign scoring (ref row) —
bf16 compute, steady-state chained timing (see _run_chained: this
transport's block_until_ready does not synchronize, so iterations are
serialized via a 1-byte data dependency and synced once per trial).
"""

import gc
import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache (works over the axon tunnel:
    measured 45 s -> 13 s whole-process first-call on a cached
    program). The round pre-warms .jax_cache with a full bench run, so
    the driver's run pays ~no compile time and every row fits the
    WEDETECT_BENCH_BUDGET."""
    import jax

    cache = os.environ.get(
        "WEDETECT_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    if cache and cache != "0":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          0)


def _run_chained(step, first_arg, iters, trials=4):
    """step(x) -> (scalar-ish tag array, next x). Returns best dt."""
    tag, x = step(first_arg)                 # compile
    _ = float(np.asarray(tag))               # sync warmup
    best = float("inf")
    for _t in range(trials):
        x = first_arg
        t0 = time.perf_counter()
        for _ in range(iters):
            tag, x = step(x)
        _ = float(np.asarray(tag))           # sync end
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_detect(size, k, batches, iters, quant=False):
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.configs import get_config
    from wedetect_tpu.models.wedetect import detect_step, init_variables

    cfg = get_config(size, compute_dtype="bfloat16", num_classes=k,
                     quant_int8=quant)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = init_variables(cfg, seed=0)
        variables = jax.device_put(variables, jax.devices()[0])
    except Exception:
        variables = init_variables(cfg, seed=0)
    h, w = cfg.img_size
    rng = np.random.default_rng(0)
    wtxt = jnp.asarray(rng.standard_normal((k, cfg.embed_dims))
                       .astype(np.float32))

    best = 0.0
    for b in batches:
        imgs0 = jnp.asarray(rng.integers(0, 255, (b, h, w, 3))
                            .astype(np.uint8))
        sf = jnp.ones((b, 2), jnp.float32)
        pad = jnp.zeros((b, 4), jnp.float32)
        ori = jnp.full((b, 2), float(h), jnp.float32)

        def step(imgs):
            det = detect_step(cfg, variables, imgs, wtxt, sf, pad, ori)
            tag = (det.scores[0, 0] * 0).astype(jnp.uint8)
            return tag, imgs0 + tag

        try:
            dt = _run_chained(step, imgs0, iters)
            ips = b / dt
            print(f"# {size}{'-int8' if quant else ''} {h}x{w} K={k} "
                  f"b={b}: {ips:.1f} img/s ({dt * 1e3:.1f} ms)",
                  file=sys.stderr)
            best = max(best, ips)
        except Exception as e:
            print(f"# {size} K={k} b={b} failed: {type(e).__name__}",
                  file=sys.stderr)
            break
    del variables
    gc.collect()
    return best


def _ref_random_params(cfg, gh, gw, proposals=100, queries=8,
                       seq_len=2048):
    """Device-side random bf16 params for a Ref config (host-side
    numpy init takes minutes at 4B)."""
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.models.ref import RefModules

    mh, mw = gh // 2, gw // 2
    rng = np.random.default_rng(0)
    mod = RefModules(cfg, gh, gw, dtype=jnp.bfloat16)
    patch_dim = cfg.vision.in_ch * cfg.vision.temporal_patch \
        * cfg.vision.patch ** 2
    patches = jnp.asarray(rng.standard_normal(
        (gh * gw, patch_dim)).astype(np.float32))
    n_img = mh * mw
    ids = np.full((queries, seq_len), 11, np.int32)
    ids[:, 4] = cfg.vision_start_token_id
    ids[:, 5:5 + n_img] = cfg.image_token_id
    obj0 = 5 + n_img + 32
    ids[:, obj0:obj0 + proposals] = cfg.object_token_id
    mask = np.zeros((queries, seq_len), np.int32)
    mask[:, :obj0 + proposals + 8] = 1
    pos = np.tile(np.arange(seq_len)[None, None], (3, queries, 1))
    boxes = rng.uniform(0, 600, (proposals, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    objpos = np.tile(np.arange(obj0, obj0 + proposals)[None],
                     (queries, 1)).astype(np.int32)
    shapes = jax.eval_shape(
        lambda key: mod.init(key, patches, jnp.asarray(ids),
                             jnp.asarray(mask),
                             jnp.asarray(pos.astype(np.int32)),
                             jnp.asarray(boxes),
                             jnp.asarray([960.0, 1280.0]), 5,
                             jnp.asarray(objpos)),
        jax.random.PRNGKey(0))["params"]
    nparam = sum(int(np.prod(s.shape))
                 for s in jax.tree.leaves(shapes)) / 1e9
    print(f"# ref params: {nparam:.2f}B", file=sys.stderr)
    leaves, treedef = jax.tree.flatten(shapes)
    base = jax.random.PRNGKey(1)
    return jax.tree.unflatten(treedef, [
        jax.random.normal(jax.random.fold_in(base, i), s.shape,
                          jnp.bfloat16) * jnp.bfloat16(0.02)
        for i, s in enumerate(leaves)])


def bench_rec(images=32, proposals=100, trials=3):
    """The reference's ACTUAL FPS protocol (refcoco REC): ONE query
    per image, scored end-to-end from the uint8 image through host
    Qwen preprocessing, vision tower, prefix-sharing prefill and the
    binary head — cross-image batched via RefScorer.score_rec.
    queries/s compares against the 6.6 FPS 2B baseline.

    32 images = 4 pipelined b=8 chunks per score_rec call, so the
    per-call transport round-trip (dispatch floor + readback, 30-200
    ms run-to-run on this tunnel — PERF.md "Transport sensitivity")
    amortizes the way it does on a real eval shard, instead of being
    fully exposed on a single-chunk call."""
    from wedetect_tpu.models.ref_api import RefScorer
    from wedetect_tpu.nn.qwen3vl import ref_2b

    class _CharTok:
        def encode(self, text, add_special_tokens=False):
            return [(ord(ch) % 80) + 1 for ch in text]

    cfg = ref_2b()
    gh, gw = 40, 30
    params = _ref_random_params(cfg, gh, gw, proposals)
    px = (gh * cfg.vision.patch, gw * cfg.vision.patch)
    scorer = RefScorer(cfg=cfg, params=params, tokenizer=_CharTok(),
                       grid_buckets=(px,), max_proposals=proposals,
                       dtype="bfloat16", query_batch=images)
    rng = np.random.default_rng(0)
    samples = []
    for i in range(images):
        img = rng.integers(0, 255, (960, 720, 3)).astype(np.uint8)
        pr = rng.uniform(0, 600, (proposals, 4)).astype(np.float32)
        pr[:, 2:] += pr[:, :2]
        samples.append((img, pr, f"the red object number {i}"))
    scorer.score_rec(samples)                 # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = scorer.score_rec(samples)       # returns host numpy
        best = min(best, time.perf_counter() - t0)
    assert len(out) == images
    qps = images / best
    print(f"# rec 1q/image x{images}: {qps:.1f} queries/s "
          f"({best * 1e3:.1f} ms)", file=sys.stderr)
    del scorer, params
    gc.collect()
    return qps


def bench_e2e(n_images=240, batch_size=8, trials=2):
    """Host+device eval pipeline: JPEG bytes -> native fused
    decode+letterbox on loader threads -> b=8 detect step on chip
    (the dist_test.sh workload, minus the metric bookkeeping).
    Host-bound on single-core rigs; see PERF.md."""
    import os
    import tempfile

    import cv2
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.configs import get_config
    from wedetect_tpu.data.loader import EvalLoader
    from wedetect_tpu.models.wedetect import detect_step, init_variables

    cfg = get_config("base", compute_dtype="bfloat16", num_classes=80)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = init_variables(cfg, seed=0)
        variables = jax.device_put(variables, jax.devices()[0])
    except Exception:
        variables = init_variables(cfg, seed=0)
    rng = np.random.default_rng(0)
    wtxt = jnp.asarray(rng.standard_normal((80, cfg.embed_dims))
                       .astype(np.float32))

    tmpdir = tempfile.mkdtemp(prefix="wedetect_bench_")
    sizes = [(480, 640), (720, 1280), (1080, 1920), (640, 480)]
    items = []
    for i in range(n_images):
        h, w = sizes[i % len(sizes)]
        small = rng.integers(0, 255, (h // 16, w // 16, 3))
        img = cv2.resize(small.astype(np.uint8), (w, h),
                         interpolation=cv2.INTER_LINEAR)
        path = os.path.join(tmpdir, f"{i}.jpg")
        cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        items.append({"path": path, "img_id": i})

    class _DS:
        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

    ds = _DS(items)

    def one_pass():
        # lag-1 dispatch pipeline (mirrors eval/runner.evaluate_coco):
        # the next batch loads + dispatches while the previous result
        # crosses back — the sync cost rides under host decode
        loader = EvalLoader(ds, cfg.img_size, batch_size=batch_size)
        n = 0
        pending = None
        for batch in loader:
            det = detect_step(
                cfg, variables, jnp.asarray(batch["images"]), wtxt,
                jnp.asarray(batch["scale_factor"]),
                jnp.asarray(batch["pad_param"]),
                jnp.asarray(batch["ori_shape"]))
            if pending is not None:
                _ = np.asarray(pending.valid)
            pending = det
            n += batch["n_valid"]
        if pending is not None:
            _ = np.asarray(pending.valid)
        return n

    one_pass()                                # compile + warm caches
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        n = one_pass()
        best = min(best, (time.perf_counter() - t0) / n)
    ips = 1.0 / best
    print(f"# e2e eval pipeline ({n_images} jpegs, b={batch_size}): "
          f"{ips:.1f} img/s", file=sys.stderr)
    for it in items:
        os.unlink(it["path"])
    os.rmdir(tmpdir)
    del variables
    gc.collect()
    return ips


def bench_ref(seq_len=2048, queries=8, proposals=100, iters=5,
              variant="2b", split=False, quant=False):
    """Ref REC scoring: vision tower (40x30 grid) + one batched
    flash-attention prefill scoring `proposals` boxes for `queries`
    query rows. queries/s compares against the reference's 6.6 FPS
    (2B) / 5.3 FPS (4B) — ONE query per forward upstream.

    split=True uses the prefix-sharing path (RefScorer default): the
    ~305-token image prefix runs the decoder once, the per-query
    suffixes (query text + object slots, bucketed to 256) attend to
    its KV — same logical workload, so the joint row is the direct
    baseline."""
    import jax
    import jax.numpy as jnp

    from wedetect_tpu.models.ref import (ref_score_step,
                                         ref_score_step_split)
    from wedetect_tpu.nn.qwen3vl import ref_2b, ref_4b

    cfg = ref_2b() if variant == "2b" else ref_4b()
    if quant:
        import dataclasses
        cfg = dataclasses.replace(cfg, quant_int8=True)
    gh, gw = 40, 30
    mh, mw = gh // 2, gw // 2
    rng = np.random.default_rng(0)

    patch_dim = cfg.vision.in_ch * cfg.vision.temporal_patch \
        * cfg.vision.patch ** 2
    patches = jnp.asarray(rng.standard_normal(
        (gh * gw, patch_dim)).astype(np.float32))
    n_img = mh * mw
    ids = np.full((queries, seq_len), 11, np.int32)
    ids[:, 4] = cfg.vision_start_token_id
    ids[:, 5:5 + n_img] = cfg.image_token_id
    obj0 = 5 + n_img + 32
    ids[:, obj0:obj0 + proposals] = cfg.object_token_id
    mask = np.zeros((queries, seq_len), np.int32)
    mask[:, :obj0 + proposals + 8] = 1
    pos = np.tile(np.arange(seq_len)[None, None], (3, queries, 1))
    boxes = rng.uniform(0, 600, (proposals, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    objpos = np.tile(np.arange(obj0, obj0 + proposals)[None],
                     (queries, 1)).astype(np.int32)

    params = _ref_random_params(cfg, gh, gw, proposals, queries,
                                seq_len)

    if split:
        p_real = 5 + n_img                     # preamble + vision span
        p_pad = -(-p_real // 128) * 128
        s_real = 32 + proposals + 8            # query text + objects
        s_pad = -(-s_real // 128) * 128
        pids = np.full((1, p_pad), 11, np.int32)
        pids[0, 4] = cfg.vision_start_token_id
        pids[0, 5:5 + n_img] = cfg.image_token_id
        pmask = np.zeros((1, p_pad), np.int32)
        pmask[0, :p_real] = 1
        sids = np.full((queries, s_pad), 11, np.int32)
        sobj0 = 32
        sids[:, sobj0:sobj0 + proposals] = cfg.object_token_id
        smask = np.zeros((queries, s_pad), np.int32)
        smask[:, :s_real] = 1
        ppos = np.tile(np.arange(p_pad)[None, None], (3, 1, 1))
        spos = np.tile((p_real + np.arange(s_pad))[None, None],
                       (3, queries, 1))
        sobjpos = np.tile(np.arange(sobj0, sobj0 + proposals)[None],
                          (queries, 1)).astype(np.int32)
        sargv = (patches, jnp.asarray(pids), jnp.asarray(sids),
                 jnp.asarray(pmask), jnp.asarray(smask),
                 jnp.asarray(ppos.astype(np.int32)),
                 jnp.asarray(spos.astype(np.int32)),
                 jnp.asarray(boxes), 5,
                 jnp.asarray([960.0, 1280.0], jnp.float32),
                 jnp.asarray(sobjpos))
        sidsj = sargv[2]

        def step(sids_in):
            logits = ref_score_step_split(
                cfg, gh, gw, params, sargv[0], sargv[1], sids_in,
                sargv[3], sargv[4], sargv[5], sargv[6], sargv[7],
                sargv[8], sargv[9], sargv[10], jnp.bfloat16, "auto")
            tag = (logits[0, 0] * 0).astype(jnp.int32)
            return tag, sidsj + tag

        dt = _run_chained(step, sidsj, iters)
        qps = queries / dt
        print(f"# ref{variant} split P={p_pad} S={s_pad} Q={queries}: "
              f"{qps:.1f} queries/s ({dt * 1e3:.1f} ms)",
              file=sys.stderr)
        del params
        gc.collect()
        return qps

    idsj = jnp.asarray(ids)
    argv = (patches, idsj, jnp.asarray(mask),
            jnp.asarray(pos.astype(np.int32)), 5, jnp.asarray(boxes),
            jnp.asarray([960.0, 1280.0], jnp.float32),
            jnp.asarray(objpos))

    def step(ids_in):
        logits = ref_score_step(cfg, gh, gw, params, argv[0], ids_in,
                                argv[2], argv[3], argv[4], argv[5],
                                argv[6], argv[7], jnp.bfloat16, "auto")
        tag = (logits[0, 0] * 0).astype(jnp.int32)
        return tag, idsj + tag

    dt = _run_chained(step, idsj, iters)
    qps = queries / dt
    print(f"# ref{variant} L={seq_len} Q={queries}: {qps:.1f} queries/s "
          f"({dt * 1e3:.1f} ms)", file=sys.stderr)
    del params
    gc.collect()
    return qps


def bench_gen(b=8, int8=False, trials=3, cfg=None, gh=40, gw=30,
              P=384, new=(16, 80), int4=False):
    """Text generation tok/s: 2B, bf16 weights, jitted prefill +
    KV-cache decode (P=384 bucket, 40x30-grid image prompt). Decode is
    HBM-bound, so int8=True (weight-only int8 decode tree,
    models/quant) / int4=True (packed-int4, rank-1 two-sided scales)
    measures the bandwidth win directly. tok/s is the
    marginal decode rate ((t_new[1] - t_new[0]) per extra step —
    prefill excluded). The reference has no generation benchmark (its
    twin inherits HF .generate). cfg/gh/gw/P are overridable so the
    same path is drivable at tiny scale off-chip."""
    import jax.numpy as jnp

    from wedetect_tpu.models.ref_generate import ref_generate
    from wedetect_tpu.nn.qwen3vl import ref_2b

    if cfg is None:
        cfg = ref_2b()
    params = _ref_random_params(cfg, gh, gw, proposals=1, queries=1,
                                seq_len=P)
    dp = None
    if int8 or int4:
        from wedetect_tpu.models.quant import quantize_decode_params
        dp = quantize_decode_params(params, bits=4 if int4 else 8)
    patches, ids, mask, pos, vs, real = _gen_prompt(cfg, gh, gw, b, P)
    args = (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pos), vs,
            jnp.asarray(np.full((b,), real, np.int32)),
            jnp.asarray([[0.0, 0.0, 10.0, 10.0]]),
            jnp.asarray([960.0, 1280.0]))

    def run(max_new):
        out = ref_generate(cfg, gh, gw, params, patches, *args,
                           max_new, 2, temperature=0.0,
                           dtype=jnp.bfloat16, decode_params=dp)
        # sync (block_until_ready lies here); count actual emitted
        # tokens — the scan's wall time is always max_new steps, but
        # an early random-weights EOS would pad the output, making
        # "tok/s" count junk. Assert it away instead of dividing.
        return int((np.asarray(out) != 0).sum())

    def timeit(max_new):
        n = run(max_new)     # compile + warm
        assert n == b * max_new, \
            f"early EOS under random weights ({n} != {b * max_new})"
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            run(max_new)
            best = min(best, time.perf_counter() - t0)
        return best

    step = (timeit(new[1]) - timeit(new[0])) / (new[1] - new[0])
    tps = b / step
    tag = "_int4" if int4 else ("_int8" if int8 else "")
    print(f"# gen2b{tag} b={b}: "
          f"{step * 1e3:.2f} ms/step, {tps:.1f} tok/s", file=sys.stderr)
    del params, dp
    gc.collect()
    return tps


def _gen_prompt(cfg, gh, gw, b, P, tail=17):
    """Shared image-prompt construction for the generation benches:
    right-padded (b, P) ids/mask with a vision span and `tail` text
    tokens, plus flat [3, b, P] positions. Returns (patches, ids,
    mask, pos, visual_start, real_len)."""
    import jax.numpy as jnp

    patch_dim = cfg.vision.in_ch * cfg.vision.temporal_patch \
        * cfg.vision.patch ** 2
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.standard_normal(
        (gh * gw, patch_dim)).astype(np.float32))
    n_img = (gh // 2) * (gw // 2)
    ids = np.full((b, P), 11, np.int32)
    ids[:, 4] = cfg.vision_start_token_id
    ids[:, 5:5 + n_img] = cfg.image_token_id
    real = 5 + n_img + tail
    mask = np.zeros((b, P), np.int32)
    mask[:, :real] = 1
    pos = np.tile(np.arange(P)[None, None], (3, b, 1)).astype(np.int32)
    return patches, ids, mask, pos, 5, real


def bench_spec(new=128, trials=3, cfg=None, gh=40, gw=30, P=384):
    """Prompt-lookup speculative decoding vs plain greedy decode
    (b=1, bf16, 2B): tok/s for plain and spec_k in {4, 8} PLUS the
    acceptance-collapse bound (force_reject=True: every K-wide verify
    emits one token — what non-repetitive text produces), asserting
    every spec row emits the exact plain-greedy tokens. Acceptance is
    reported per row (emitted / verify steps). NOT wired into main()
    (extra multi-minute compiles); run directly to remeasure the
    PERF.md "Speculative decoding" section. Regime caveat lives there:
    random-weight greedy cycles are the favorable regime; the
    force_reject row is the honest floor."""
    import jax.numpy as jnp

    from wedetect_tpu.models.ref_generate import ref_generate
    from wedetect_tpu.models.ref_speculative import ref_generate_spec
    from wedetect_tpu.nn.qwen3vl import ref_2b

    if cfg is None:
        cfg = ref_2b()
    params = _ref_random_params(cfg, gh, gw, proposals=1, queries=1,
                                seq_len=P)
    patches, ids, mask, pos, vs, real = _gen_prompt(cfg, gh, gw, 1, P)
    common = (cfg, gh, gw, params, patches, jnp.asarray(ids),
              jnp.asarray(mask), jnp.asarray(pos), vs,
              jnp.asarray(np.full((1,), real, np.int32)),
              jnp.asarray([[0.0, 0.0, 10.0, 10.0]]),
              jnp.asarray([960.0, 1280.0]))

    def t_plain():
        return np.asarray(ref_generate(*common, new, 2,
                                       temperature=0.0,
                                       dtype=jnp.bfloat16))

    def t_spec(k, force_reject=False):
        toks, steps = ref_generate_spec(*common, new, 2, spec_k=k,
                                        dtype=jnp.bfloat16,
                                        force_reject=force_reject)
        return np.asarray(toks), int(np.asarray(steps))

    res = {}
    toks_p = t_plain()
    # tok/s = DELIVERED tokens / wall for both rows: the spec
    # while_loop early-exits on EOS while the plain scan always runs
    # `new` steps, so dividing both by `new` would inflate only the
    # spec rate if random weights emit an early EOS (ADVICE r3).
    n_emit = int((toks_p != 0).sum())
    best = min(_timed(t_plain) for _ in range(trials))
    res["emitted"] = n_emit
    res["plain_tok_s"] = round(n_emit / best, 1)
    for k in (4, 8):
        toks_s, steps = t_spec(k)
        assert (toks_p == toks_s).all(), "speculative not greedy-exact"
        best = min(_timed(lambda: t_spec(k)) for _ in range(trials))
        res[f"spec{k}_tok_s"] = round(n_emit / best, 1)
        res[f"spec{k}_steps"] = steps
        res[f"spec{k}_accept"] = round(n_emit / steps, 2)
    # acceptance-collapse floor: every draft rejected, each step is
    # still a K-wide verify forward (K=8, the worse case of the two)
    toks_r, steps_r = t_spec(8, force_reject=True)
    assert (toks_p == toks_r).all(), "force_reject not greedy-exact"
    best = min(_timed(lambda: t_spec(8, force_reject=True))
               for _ in range(trials))
    res["spec8_reject_tok_s"] = round(n_emit / best, 1)
    res["spec8_reject_steps"] = steps_r
    print(f"# spec b=1: {res}", file=sys.stderr)
    del params
    gc.collect()
    return res


def bench_serve(nreq=32, slots=8, new=128, cfg=None, gh=40, gw=30,
                P=384, chunks=(16, 32), int8_prefill=False,
                int8_decode=False, int4_decode=False,
                piggyback=False, batch_admit=False, trials=3,
                tail=17, int8_kv=False):
    """Continuous-batching GenServer sustained tok/s: nreq requests x
    `new` tokens through a `slots`-slot server (bf16, 2B), admission +
    prefill included in the wall time. Compare against bench_gen's
    static-batch marginal rate (bf16, or int8 when int8_decode=True —
    like-for-like pairs). int8_prefill quantizes the admission
    prefills (ops/int8.py dynamic int8); int8_decode uses the
    weight-only int8 decode tree (models/quant); piggyback rides each
    steady-state admission's decoder prefill on the decode chunks
    (models/serve._decode_chunk_pb)."""
    import dataclasses

    import jax.numpy as jnp

    from wedetect_tpu.models.serve import GenServer
    from wedetect_tpu.nn.qwen3vl import ref_2b

    if cfg is None:
        cfg = ref_2b()
    params = _ref_random_params(cfg, gh, gw, proposals=1, queries=1,
                                seq_len=P)
    decode_params = None
    if int8_decode or int4_decode:
        from wedetect_tpu.models.quant import quantize_decode_params
        decode_params = quantize_decode_params(
            params, bits=4 if int4_decode else 8)
    if int8_prefill:
        cfg = dataclasses.replace(cfg, quant_int8=True)
    patches, ids, mask, pos, vs, real = _gen_prompt(cfg, gh, gw, 1, P,
                                                    tail=tail)

    def fill(srv, n):
        for i in range(n):
            m = mask[0].copy()
            m[: real + (i % 8)] = 1              # ragged real lengths
            srv.submit(patches, ids[0], m, pos[:, 0], vs,
                       real + (i % 8))

    res = {}
    for chunk in chunks:
        srv = GenServer(cfg, gh, gw, params, slots=slots,
                        prompt_len=P, max_new=new, chunk=chunk,
                        eos_id=2, dtype=jnp.bfloat16,
                        decode_params=decode_params,
                        piggyback=piggyback, batch_admit=batch_admit,
                        kv_bits=8 if int8_kv else 16)
        # warm with slots-many submissions so every ragged length and
        # slot index seen in the timed run is exercised (ADVICE r3)
        fill(srv, slots)
        srv.run()                                 # compile both paths
        del srv                # free the warm KV pool (compiles live
        gc.collect()           # in the jit cache, not the server)

        def timed_run(pipeline):
            srv2 = GenServer(cfg, gh, gw, params, slots=slots,
                             prompt_len=P, max_new=new, chunk=chunk,
                             eos_id=2, dtype=jnp.bfloat16,
                             decode_params=decode_params,
                             piggyback=piggyback,
                             batch_admit=batch_admit,
                             kv_bits=8 if int8_kv else 16)
            t0 = time.perf_counter()
            fill(srv2, nreq)
            out = srv2.run(pipeline=pipeline)
            dt = time.perf_counter() - t0
            total = sum(len(v) for v in out.values())
            return srv2, total, dt

        # best-of-N: this row is the MOST transport-exposed (a host
        # readback every chunk) and was the only single-shot one —
        # BENCH_r04 recorded a degraded-tunnel 519 tok/s vs the 928
        # steady state (VERDICT r4 weak #1 / next #1a)
        srv2 = total = dt = None
        for _ in range(trials):
            srv_t, total_t, dt_t = timed_run(True)
            if srv2 is None or total_t / dt_t > total / dt:
                srv2, total, dt = srv_t, total_t, dt_t
            else:
                del srv_t      # one live KV pool at a time (HBM)
            gc.collect()
        steps = srv2.stats["chunks"] * chunk * slots
        # the pool's preallocated KV footprint (the HBM cost a longer
        # prompt bucket buys into — VERDICT r5 #8)
        import jax

        res["kv_gb"] = round(sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves(srv2._state[0])) / 1e9, 3)
        # stats snapshot BEFORE the probes below mutate them
        n_chunks_run = srv2.stats["chunks"]
        n_admit_disp_run = srv2.stats["admits"] - srv2.stats.get(
            "pb_admits", 0)
        res[f"chunk{chunk}_tok_s"] = round(total / dt, 1)
        res[f"chunk{chunk}_occupancy"] = round(total / steps, 3)
        srv_sync, total_s, dt_s = timed_run(False)
        del srv_sync           # one live KV pool at a time: 3 pools
        gc.collect()           # at slots=64 would exceed 16 GB HBM
        res[f"chunk{chunk}_sync_tok_s"] = round(total_s / dt_s, 1)
        # device-time microprobes on the warm server for the gap
        # accounting: one synced prefill, one synced decode chunk
        fill(srv2, 1)
        t0 = time.perf_counter()
        srv2._admit_queued()
        np.asarray(srv2._state[4])
        admit_s = time.perf_counter() - t0
        res[f"chunk{chunk}_admit_ms"] = round(admit_s * 1e3, 1)
        t0 = time.perf_counter()
        toks, _ = srv2._dispatch_chunk()
        np.asarray(toks)
        res[f"chunk{chunk}_chunk_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        # device-only chunk time: chain 4 async dispatches, sync once
        # — per-chunk transport (dispatch floor + readback) pipelines
        # away, leaving the device compute the engine can't beat
        t0 = time.perf_counter()
        for _ in range(4):
            toks, _ = srv2._dispatch_chunk()
        np.asarray(toks)
        chunk4_s = time.perf_counter() - t0
        res[f"chunk{chunk}_chunk_dev_ms"] = round(chunk4_s / 4 * 1e3, 1)
        # device-limited ceiling from the timed run's own schedule:
        # the chunks it dispatched at device-only speed, plus its
        # admission prefills. The synced admit probe embeds one
        # transport round trip the pipelined run hides — subtract the
        # measured 1-op dispatch floor so a long-prompt pool's many
        # 80ms admits don't deflate the ceiling below the measured
        # rate (observed at P=1024). The ratio tok_s/ceiling is the
        # transport health of the recorded row (VERDICT r4 next #1c).
        z = (jnp.zeros((), jnp.float32) + 1).block_until_ready()
        floor_s = None
        for _ in range(3):
            t0 = time.perf_counter()
            z = (z + 1).block_until_ready()
            dt_f = time.perf_counter() - t0
            floor_s = dt_f if floor_s is None else min(floor_s, dt_f)
        admit_dev_s = max(admit_s - floor_s, admit_s * 0.25)
        # the 4-chain pays ONE final sync too: subtract one floor
        # before dividing (at a 30ms dispatch floor the residual
        # +8ms/chunk was enough to push the ceiling below the
        # measured rate at P=1024)
        chunk_dev_s = max((chunk4_s - floor_s) / 4, chunk4_s / 8)
        dev_total_s = (n_chunks_run * chunk_dev_s
                       + n_admit_disp_run * admit_dev_s)
        res[f"chunk{chunk}_ceiling_tok_s"] = round(
            total / dev_total_s, 1)
        print(f"# serve chunk={chunk}: {total} toks in {dt:.2f}s = "
              f"{total / dt:.1f} tok/s of ceiling "
              f"{res[f'chunk{chunk}_ceiling_tok_s']} (sync "
              f"{total_s / dt_s:.1f}, occupancy {total / steps:.3f}, "
              f"admit {res[f'chunk{chunk}_admit_ms']} ms, chunk "
              f"{res[f'chunk{chunk}_chunk_ms']} ms, dev "
              f"{res[f'chunk{chunk}_chunk_dev_ms']} ms)",
              file=sys.stderr)
        del srv2
        gc.collect()
    del params
    gc.collect()
    return res


def bench_multi(n_images=2, queries=16, proposals=50, trials=3):
    """Multi-image conversation REC scoring (VERDICT r4 next #5's
    measured row): `queries` queries each scored against `proposals`
    boxes in EVERY one of `n_images` images sharing ONE conversation,
    through RefScorer.score_multi_images (2B bf16, 448x448 grid
    bucket, device patchify). Returns split_q_s (prefix sharing ON —
    the default: every image sits in the shared prefix, one
    ref_prefix_step_multi, per-query suffixes on its KV;
    golden-pinned vs joint in tests/test_ref_api) and joint_q_s (the
    joint-prefill fallback that pays the full quadratic prompt per
    query batch)."""
    import jax.numpy as jnp  # noqa: F401 (jax init before scorer)

    from wedetect_tpu.models.ref_api import RefScorer
    from wedetect_tpu.nn.qwen3vl import ref_2b

    cfg = ref_2b()
    gh = gw = 448 // cfg.vision.patch
    params = _ref_random_params(cfg, gh, gw, proposals, 8, 1024)

    class _Tok:
        def encode(self, s, add_special_tokens=False):
            return [(ord(c) % 80) + 11 for c in s]

    rng = np.random.default_rng(0)
    images = [(rng.random((448, 448, 3)) * 255).astype(np.uint8)
              for _ in range(n_images)]
    plist = []
    for _ in range(n_images):
        b = rng.uniform(0, 300, (proposals, 4)).astype(np.float32)
        b[:, 2:] += b[:, :2]
        plist.append(b)
    qs = [f"object kind {i:02d}" for i in range(queries)]

    res = {}
    for split in (True, False):
        scorer = RefScorer(cfg=cfg, params=params, tokenizer=_Tok(),
                           dtype="bfloat16", max_proposals=proposals,
                           grid_buckets=((448, 448),),
                           prefix_sharing=split)
        scorer.score_multi_images(images, plist, qs[:2])    # compile
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            out = scorer.score_multi_images(images, plist, qs)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        assert len(out) == n_images
        assert out[0].shape == (queries, proposals)
        key = "split" if split else "joint"
        res[f"{key}_q_s"] = round(queries / best, 2)
        print(f"# multi{n_images} {key}: {queries} queries in "
              f"{best:.2f}s = {res[f'{key}_q_s']} q/s",
              file=sys.stderr)
        del scorer
        gc.collect()
    del params
    gc.collect()
    return res


def bench_train(b=8, iters=8, trials=3):
    """WeDetect-Base train-step throughput on one chip: full forward
    (bf16 compute) + TAL assignment + CIoU/BCE/DFL losses + backward +
    AdamW update, b=8 640x640, K=80, 2 gt/image. img/s; the reference
    ships the loss path but no detector train launcher (SURVEY §0), so
    there is no upstream baseline row."""
    import functools

    import jax
    import jax.numpy as jnp

    from wedetect_tpu.configs import get_config
    from wedetect_tpu.models.wedetect import init_variables
    from wedetect_tpu.train.optimizer import make_optimizer
    from wedetect_tpu.train.train_step import (Batch, TrainState,
                                               train_step)

    cfg = get_config("base", compute_dtype="bfloat16", num_classes=80)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = init_variables(cfg, seed=0)
        variables = jax.device_put(variables, jax.devices()[0])
    except Exception:
        variables = init_variables(cfg, seed=0)
    tx = make_optimizer(variables["params"])
    state = TrainState.create(variables, tx)
    rng = np.random.default_rng(0)
    gt = np.tile(np.array([[8, 8, 240, 240], [16, 16, 400, 560]],
                          np.float32), (b, 1, 1))
    batch = Batch(
        images=jnp.asarray(rng.integers(0, 255, (b, 640, 640, 3))
                           .astype(np.uint8)),
        texts=jnp.asarray(rng.standard_normal(
            (80, cfg.embed_dims)).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, 2), jnp.int32),
        gt_mask=jnp.ones((b, 2), bool))
    jstep = jax.jit(functools.partial(train_step, cfg))

    state, metrics = jstep(state, batch)          # compile
    loss = float(np.asarray(metrics["loss"]))     # sync
    assert np.isfinite(loss), loss
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = jstep(state, batch)
        _ = float(np.asarray(metrics["loss"]))    # sync
        best = min(best, (time.perf_counter() - t0) / iters)
    ips = b / best
    print(f"# train base-640 b={b}: {ips:.1f} img/s "
          f"({best * 1e3:.1f} ms/step)", file=sys.stderr)
    del state, variables
    gc.collect()
    return ips


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def bench_transport():
    """Tunnel/transport microprobes, recorded as BENCH sub-rows so a
    degraded transport is visible in the record itself (VERDICT r4
    weak #2: host-in-the-loop rows swung 1.6x between rounds with
    identical code — dispatch floor 3-35 ms, readback 30-200 ms by
    hour, NOTES.md "Environment gotchas"). best-of-N so a single GC
    pause can't pollute the probe."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((), jnp.float32)
    np.asarray(f(x))                               # compile + warm
    dispatch = min(_timed(lambda: np.asarray(f(x))) for _ in range(5))
    big = jax.device_put(np.zeros(10 * 1024 * 1024 // 4, np.float32))
    np.asarray(big)                                # warm the path
    readback = min(_timed(lambda: np.asarray(big)) for _ in range(3))
    return {"dispatch_ms": round(dispatch * 1e3, 1),
            "readback10mb_ms": round(readback * 1e3, 1)}


def main():
    import jax

    _enable_compile_cache()
    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    quick = "--quick" in sys.argv  # headline row only, fewer iters
    only = None
    if "--row" in sys.argv:
        only = sys.argv[sys.argv.index("--row") + 1]
    budget = float(os.environ.get("WEDETECT_BENCH_BUDGET", "2100"))
    t_start = time.monotonic()
    baseline = 35.1  # reference WeDetect-Base FPS (BASELINE.md)
    sub = {}

    def emit(base):
        # re-printed after every row; the driver keeps the LAST parse,
        # so a timeout mid-row can no longer blank the record
        print(json.dumps({
            "metric": "wedetect_base_640_img_per_s",
            "value": round(base, 2),
            "unit": "img/s",
            "vs_baseline": round(base / baseline, 3),
            "sub": sub,
        }), flush=True)

    base = 0.0
    if on_tpu and not quick:
        # transport probes FIRST: they timestamp the tunnel's health
        # for every row that follows (host-in-the-loop rows are
        # hostage to it — VERDICT r4 weak #2)
        try:
            probe = bench_transport()
            sub["probe_dispatch_ms"] = probe["dispatch_ms"]
            sub["probe_readback10mb_ms"] = probe["readback10mb_ms"]
            print(f"# transport probe: dispatch "
                  f"{probe['dispatch_ms']} ms, 10MB readback "
                  f"{probe['readback10mb_ms']} ms", file=sys.stderr)
        except Exception as e:
            print(f"# transport probe failed: {e!r}", file=sys.stderr)
    if only is None or only == "base":
        base = bench_detect(
            "base", 80,
            ((8,) if quick else (8, 16)) if on_tpu else (1,),
            (5 if quick else 15) if on_tpu else 2)
        emit(base)
    if quick or not on_tpu:
        return

    def row_tiny():
        v = bench_detect("tiny", 80, (8,), 5)
        sub["wedetect_tiny_640_img_per_s"] = round(v, 2)
        sub["tiny_vs_baseline"] = round(v / 62.5, 3)

    def row_large():
        v = bench_detect("large", 80, (8,), 5)
        sub["wedetect_large_1280_img_per_s"] = round(v, 2)
        sub["large_vs_baseline"] = round(v / 6.0, 3)

    def row_k1280():
        sub["wedetect_base_640_k1280_img_per_s"] = round(
            bench_detect("base", 1280, (8,), 5), 2)

    def row_int8():
        sub["wedetect_base_640_int8_img_per_s"] = round(
            bench_detect("base", 80, (8,), 5, quant=True), 2)

    def row_ref2b():
        # production path (RefScorer default): prefix sharing. (The
        # joint L=2048 flash row is documented in PERF.md; omitted
        # here to bound the driver bench's compile count.)
        v = bench_ref(split=True)
        sub["ref2b_queries_per_s"] = round(v, 2)
        sub["ref2b_vs_baseline"] = round(v / 6.6, 3)

    def row_ref4b():
        v = bench_ref(variant="4b", iters=3, split=True)
        sub["ref4b_queries_per_s"] = round(v, 2)
        sub["ref4b_vs_baseline"] = round(v / 5.3, 3)

    def row_gen():
        sub["gen2b_bf16_tok_per_s"] = round(bench_gen(b=8), 1)

    def row_serve():
        # chunk=8 is the pipelined-run optimum (PERF.md round-4
        # serving section: smaller chunks cut slot idle once the
        # readback no longer stalls the device). best-of-3 + exported
        # device/transport microprobes so a degraded tunnel is
        # visible in the record itself (VERDICT r4 next #1).
        probe = bench_transport()
        sub["serve_probe_dispatch_ms"] = probe["dispatch_ms"]
        sub["serve_probe_readback10mb_ms"] = probe["readback10mb_ms"]
        r = bench_serve(chunks=(8,))
        sub["serve2b_tok_per_s"] = r["chunk8_tok_s"]
        sub["serve2b_occupancy"] = r["chunk8_occupancy"]
        sub["serve2b_tok_per_s_ceiling"] = r["chunk8_ceiling_tok_s"]
        sub["serve2b_admit_ms"] = r["chunk8_admit_ms"]
        sub["serve2b_chunk_ms"] = r["chunk8_chunk_ms"]
        sub["serve2b_chunk_dev_ms"] = r["chunk8_chunk_dev_ms"]

    def row_serve_p1024():
        # long-prompt pool (VERDICT r5 #8): the Ref training cap is
        # 5120 tokens but the r4 service bucketed prompts at <=512;
        # this row measures a P=1024 pool with ~1016-token real
        # prompts (flash admission) and records the KV footprint the
        # bucket buys into. trials=2/nreq=16 bound the extra compile
        # + prefill cost; the P=384 row above carries the
        # transport-health probes for the record.
        r = bench_serve(P=1024, tail=711, nreq=16, chunks=(8,),
                        trials=2)
        sub["serve2b_p1024_tok_per_s"] = r["chunk8_tok_s"]
        sub["serve2b_p1024_occupancy"] = r["chunk8_occupancy"]
        sub["serve2b_p1024_tok_per_s_ceiling"] = \
            r["chunk8_ceiling_tok_s"]
        sub["serve2b_p1024_admit_ms"] = r["chunk8_admit_ms"]
        sub["serve2b_p1024_kv_gb"] = r["kv_gb"]

    def row_serve_kv8():
        # int8 KV cache pool at the long bucket (round-5 addition):
        # the serve_p1024 workload with the KV stored as int8 codes +
        # per-(token, head) scales — ~0.52x pool HBM and decode KV
        # read traffic (models/serve kv_bits=8)
        r = bench_serve(P=1024, tail=711, nreq=16, chunks=(8,),
                        trials=2, int8_kv=True)
        sub["serve2b_p1024_kv8_tok_per_s"] = r["chunk8_tok_s"]
        sub["serve2b_p1024_kv8_occupancy"] = r["chunk8_occupancy"]
        sub["serve2b_p1024_kv8_kv_gb"] = r["kv_gb"]

    def row_ref2b_int8():
        sub["ref2b_int8_queries_per_s"] = round(
            bench_ref(split=True, quant=True), 2)

    def row_gen_int8():
        sub["gen2b_int8_tok_per_s"] = round(bench_gen(b=8, int8=True), 1)

    def row_gen_int4():
        sub["gen2b_int4_tok_per_s"] = round(bench_gen(b=8, int4=True), 1)

    def row_rec():
        # the reference's actual FPS protocol: 1 query per image
        v = bench_rec()
        sub["rec_1q_queries_per_s"] = round(v, 2)
        sub["rec_1q_vs_baseline"] = round(v / 6.6, 3)

    def row_e2e():
        sub["e2e_eval_img_per_s"] = round(bench_e2e(), 2)

    def row_multi():
        r = bench_multi()
        sub["multi2b_split_q_per_s"] = r["split_q_s"]
        sub["multi2b_joint_q_per_s"] = r["joint_q_s"]

    def row_train():
        sub["train_base_640_img_per_s"] = round(bench_train(), 2)

    # (name, worst-case cost estimate in s, fn) — required rows first
    # (the r2-era set VERDICT r3 item 1 lists), noisy host-in-the-loop
    # rows last. Estimates are generous cold-compile wall times.
    rows = [
        ("tiny", 90, row_tiny),
        ("large", 130, row_large),
        ("k1280", 110, row_k1280),
        ("int8", 120, row_int8),
        ("ref2b", 260, row_ref2b),
        ("ref4b", 380, row_ref4b),
        ("gen", 330, row_gen),
        ("serve", 420, row_serve),
        ("serve_p1024", 300, row_serve_p1024),
        ("serve_kv8", 280, row_serve_kv8),
        ("ref2b_int8", 260, row_ref2b_int8),
        ("gen_int8", 260, row_gen_int8),
        ("gen_int4", 260, row_gen_int4),
        ("train", 240, row_train),
        ("rec", 220, row_rec),
        ("e2e", 160, row_e2e),
        ("multi2b", 260, row_multi),
    ]
    for name, est, fn in rows:
        if only is not None and name != only:
            continue
        elapsed = time.monotonic() - t_start
        if only is None and elapsed + est > budget:
            print(f"# skip {name}: {elapsed:.0f}s elapsed + ~{est}s "
                  f"> {budget:.0f}s budget", file=sys.stderr)
            continue
        try:
            fn()
        except Exception as e:
            print(f"# {name} bench failed: {e!r}", file=sys.stderr)
        emit(base)


if __name__ == "__main__":
    main()
