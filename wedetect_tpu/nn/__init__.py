"""Neural-network building blocks (flax.linen, NHWC, TPU-native)."""

from wedetect_tpu.nn.layers import ConvBN, Transpose2x
from wedetect_tpu.nn.convnext import ConvNeXt
from wedetect_tpu.nn.bifpan import CSPRepBiFPANNeck
from wedetect_tpu.nn.head import WeDetectHead, bn_fold_scale_bias
from wedetect_tpu.nn.yolov5_head import YOLOv5HeadModule

__all__ = [
    "ConvBN", "Transpose2x", "ConvNeXt", "CSPRepBiFPANNeck",
    "WeDetectHead", "bn_fold_scale_bias", "YOLOv5HeadModule",
]
