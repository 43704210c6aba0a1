"""Flax/linen models: NHWC, bfloat16-friendly, fully jittable.

Component parity with reference src/yolo/models.py:
- ``Backbone`` (abstract, models.py:6-30)
- ``YOLOv1Backbone`` (24-conv paper stack, models.py:33-128)
- ``ResNetBackbone`` (ResNet50 feature extractor, models.py:131-176)
- ``DetectionHead`` (conv + FC head, models.py:279-348)
- ``YOLOv1`` (combinator with backbone dispatch, models.py:179-276)
"""

from yolo_tpu.models.backbones import Backbone, ResNetBackbone, YOLOv1Backbone
from yolo_tpu.models.heads import DetectionHead, SimpleHead
from yolo_tpu.models.yolo import YOLOv1, create_model, init_model

__all__ = [
    "Backbone",
    "DetectionHead",
    "ResNetBackbone",
    "SimpleHead",
    "YOLOv1",
    "YOLOv1Backbone",
    "create_model",
    "init_model",
]
