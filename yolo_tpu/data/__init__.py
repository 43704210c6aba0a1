"""VOC data pipeline: XML parsing, YOLO target encoding, augmentation, loader.

Capability parity with reference src/yolo/dataset.py (VOCDetectionYOLO,
CombinedVOCDataset, create_voc_datasets, VOC_CLASSES, Kaggle download) without
any torchvision dependency: annotations are parsed directly from the VOC XML,
and images are decoded/augmented by a prefetching host loader that feeds
device-resident, fixed-shape batches.
"""

from yolo_tpu.data.voc import (
    VOC_CLASSES,
    CombinedVOCDataset,
    VOCDetectionYOLO,
    create_voc_datasets,
    encode_target,
    parse_voc_xml,
)
from yolo_tpu.data.loader import DataLoader

__all__ = [
    "VOC_CLASSES",
    "CombinedVOCDataset",
    "DataLoader",
    "VOCDetectionYOLO",
    "create_voc_datasets",
    "encode_target",
    "parse_voc_xml",
]
