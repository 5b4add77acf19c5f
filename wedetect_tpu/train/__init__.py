"""Training: assigner, losses, optimizer, steps, loops."""

from wedetect_tpu.train.assigner import AssignResult, assign
from wedetect_tpu.train.losses import DetLosses, detection_loss
from wedetect_tpu.train.optimizer import make_optimizer
from wedetect_tpu.train.train_step import Batch, TrainState, train_step
from wedetect_tpu.train.yolov5_loss import V5Losses, yolov5_loss

__all__ = ["AssignResult", "assign", "DetLosses", "detection_loss",
           "make_optimizer", "Batch", "TrainState", "train_step",
           "V5Losses", "yolov5_loss"]
