"""Host-side data: datasets, loaders, augmentations, preprocessing."""

from wedetect_tpu.data.coco import (CocoDetDataset, first_texts,
                                    load_class_texts)
from wedetect_tpu.data.loader import EvalLoader, load_image_rgb

__all__ = ["CocoDetDataset", "first_texts", "load_class_texts",
           "EvalLoader", "load_image_rgb"]
