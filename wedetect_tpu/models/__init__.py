"""Model assemblies and user-facing APIs."""

from wedetect_tpu.models.api import Detector
from wedetect_tpu.models.ref_api import RefScorer
from wedetect_tpu.models.wedetect import (Detections, WeDetectModule,
                                          detect_step, forward_raw,
                                          init_variables)

__all__ = ["Detector", "RefScorer", "Detections", "WeDetectModule",
           "detect_step", "forward_raw", "init_variables"]
