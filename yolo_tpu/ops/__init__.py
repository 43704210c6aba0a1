"""Jitted XLA/Pallas compute ops: box geometry, decode, NMS, loss, matching.

These replace the reference's three divergent host-side implementations of
IoU/decode/NMS (reference: src/yolo/loss.py:174-212, src/yolo/inference.py:141-317,
src/yolo/metrics.py:173-341) with one set of batched, fixed-shape, on-device ops.
"""

from yolo_tpu.ops.boxes import (
    box_area,
    center_to_corners,
    corners_to_center,
    iou_cellwise,
    iou_pairwise,
)
from yolo_tpu.ops.decode import decode_predictions, decode_ground_truth
from yolo_tpu.ops.nms import batched_nms
from yolo_tpu.ops.pallas_nms import pallas_nms
from yolo_tpu.ops.loss import yolo_loss, YOLOLoss

__all__ = [
    "pallas_nms",
    "box_area",
    "center_to_corners",
    "corners_to_center",
    "iou_cellwise",
    "iou_pairwise",
    "decode_predictions",
    "decode_ground_truth",
    "batched_nms",
    "yolo_loss",
    "YOLOLoss",
]
