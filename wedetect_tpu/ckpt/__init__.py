"""Checkpoints: torch->JAX converters, BN/Rep fusion, orbax io."""

from wedetect_tpu.ckpt.convert import (canonicalize_torch_keys,
                                       convert_detector,
                                       load_torch_checkpoint)
from wedetect_tpu.ckpt.fuse import bake_text_head, fold_conv_bn
from wedetect_tpu.ckpt.io import (latest_checkpoint, load_checkpoint,
                                  save_checkpoint)

__all__ = ["canonicalize_torch_keys", "convert_detector",
           "load_torch_checkpoint", "bake_text_head", "fold_conv_bn",
           "latest_checkpoint", "load_checkpoint", "save_checkpoint"]
