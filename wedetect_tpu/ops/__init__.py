from wedetect_tpu.ops.priors import grid_priors, flat_priors_and_strides
from wedetect_tpu.ops.boxes import (
    distance2bbox,
    bbox2distance,
    bbox_overlaps_aligned,
    pairwise_iou,
)
from wedetect_tpu.ops.dfl import dfl_expectation
from wedetect_tpu.ops.nms import batched_static_nms
