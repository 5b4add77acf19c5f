"""Shared WeDetect-Ref checkpoint loading for the CLI entry points.

Loads an HF-format directory (config.json + tokenizer + *.safetensors,
the reference's checkpoint layout) into (RefCfg, jax params,
tokenizer)."""

from __future__ import annotations

import glob
import os


def load_ref(checkpoint: str):
    import transformers

    from wedetect_tpu.ckpt.convert_ref import convert_ref_model
    from wedetect_tpu.nn.qwen3vl import RefCfg

    if not checkpoint:
        raise SystemExit(
            "random-init Ref requires the full Qwen3-VL config; supply "
            "--ref_checkpoint (HF dir with config.json + weights)")
    hf_cfg = transformers.AutoConfig.from_pretrained(checkpoint)
    cfg = RefCfg.from_hf_config(hf_cfg)
    tok = transformers.AutoTokenizer.from_pretrained(checkpoint)
    obj_id = tok.convert_tokens_to_ids("<object>")
    if obj_id is not None and obj_id >= 0:
        cfg = type(cfg)(**{**cfg.__dict__, "object_token_id": obj_id})

    from safetensors import safe_open  # type: ignore

    sd = {}
    for f in sorted(glob.glob(os.path.join(checkpoint,
                                           "*.safetensors"))):
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                sd[k] = sf.get_tensor(k)
    params = convert_ref_model(sd, cfg)
    return cfg, params, tok
