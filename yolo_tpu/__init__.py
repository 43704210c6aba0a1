"""yolo_tpu — a TPU-native YOLOv1 object-detection framework.

Built from scratch for TPU (JAX / XLA / Pallas / pjit) with the same capability
surface as the reference PyTorch implementation (mattiaskvist/yolo-v1):

- Models: 24-conv ``YOLOv1Backbone``, ``ResNetBackbone`` (ResNet50), ``DetectionHead``,
  ``YOLOv1`` combinator (reference: src/yolo/models.py).
- Multi-part YOLO loss with responsible-box selection (reference: src/yolo/loss.py).
- Fully on-device batched decode + per-class greedy NMS (reference runs these as
  Python loops in src/yolo/inference.py:141-317 and src/yolo/metrics.py:173-296).
- On-device mAP@50:95 evaluator with per-class and per-size breakdowns
  (reference: src/yolo/metrics.py).
- VOC data pipeline, trainer with bf16 + grad clipping + multi-step LR +
  checkpoint/resume, TensorBoard-compatible logging (reference: src/yolo/training/).
- Data-parallel (and tensor-parallel head) execution over a ``jax.sharding.Mesh``.

The public re-export list mirrors the reference package root
(reference: src/yolo/__init__.py:3-31).
"""

from yolo_tpu.version import __version__
from yolo_tpu.schemas import BoundingBox, Detection
from yolo_tpu.models import (
    Backbone,
    DetectionHead,
    ResNetBackbone,
    YOLOv1,
    YOLOv1Backbone,
)
from yolo_tpu.ops.loss import YOLOLoss, yolo_loss
from yolo_tpu.data import (
    VOC_CLASSES,
    CombinedVOCDataset,
    VOCDetectionYOLO,
    create_voc_datasets,
)
from yolo_tpu.metrics import evaluate_model, mAPMetric
from yolo_tpu.inference import YOLOInference

__all__ = [
    "Backbone",
    "BoundingBox",
    "CombinedVOCDataset",
    "Detection",
    "DetectionHead",
    "ResNetBackbone",
    "VOCDetectionYOLO",
    "VOC_CLASSES",
    "YOLOInference",
    "YOLOLoss",
    "YOLOv1",
    "YOLOv1Backbone",
    "create_voc_datasets",
    "evaluate_model",
    "mAPMetric",
    "yolo_loss",
    "__version__",
]
