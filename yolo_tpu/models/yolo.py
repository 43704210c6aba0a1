"""The full YOLOv1 model: backbone + detection head combinator.

Dispatch parity with reference src/yolo/models.py:179-276:
- no backbone given        -> YOLOv1Backbone + SimpleHead
- YOLOv1Backbone           -> SimpleHead (Flatten -> 4096 -> out)
- ResNetBackbone           -> DetectionHead(2048-in)
- custom backbone, no head -> ValueError
Output is always (N, S, S, B*5 + C); 2-D head outputs are reshaped
(reference: src/yolo/models.py:273-274).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_tpu.models.backbones import Backbone, ResNetBackbone, YOLOv1Backbone
from yolo_tpu.models.heads import DetectionHead, SimpleHead


class YOLOv1(nn.Module):
    """YOLOv1 detector with modular backbone support.

    Attributes mirror the reference model (src/yolo/models.py:189-196):
    num_classes (C), S, B, plus the resolved backbone/head submodules.
    """

    num_classes: int = 20
    S: int = 7
    B: int = 2
    backbone: Optional[nn.Module] = None
    detection_head: Optional[nn.Module] = None
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    def setup(self):
        # Canonical param-tree keys are "backbone" and "detection_head"
        # regardless of whether the submodule was passed in (linen names
        # dataclass-attribute modules by attribute name) or default-created
        # here (explicit name=).
        if self.backbone is not None:
            self._backbone = self.backbone
        else:
            self._backbone = YOLOv1Backbone(
                dtype=self.dtype, quantized=self.quantized, name="backbone"
            )

        if self.detection_head is not None:
            self._head = self.detection_head
        else:
            backbone = self._backbone
            if isinstance(backbone, YOLOv1Backbone):
                self._head = SimpleHead(
                    num_classes=self.num_classes, S=self.S, B=self.B,
                    dtype=self.dtype, name="detection_head",
                )
            elif isinstance(backbone, ResNetBackbone):
                self._head = DetectionHead(
                    num_classes=self.num_classes, S=self.S, B=self.B,
                    dtype=self.dtype, quantized=self.quantized,
                    name="detection_head",
                )
            else:
                raise ValueError(
                    "Must provide detection_head for custom backbone types"
                )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        features = self._backbone(x, train=train)
        out = self._head(features, train=train)
        if out.ndim == 2:
            out = out.reshape(-1, self.S, self.S, self.B * 5 + self.num_classes)
        return out


def create_model(
    backbone: str = "resnet",
    num_classes: int = 20,
    S: int = 7,
    B: int = 2,
    dtype: jnp.dtype = jnp.float32,
    quantized: bool = False,
) -> YOLOv1:
    """Factory: 'resnet' (flagship, reference train.py:144-145) or 'yolov1'.

    ``quantized=True`` builds the dynamic-int8 inference variant (same param
    tree; conv compute runs int8 on the MXU — inference only).
    """
    if backbone == "resnet":
        bb: nn.Module = ResNetBackbone(dtype=dtype, quantized=quantized)
    elif backbone == "yolov1":
        bb = YOLOv1Backbone(dtype=dtype, quantized=quantized)
    else:
        raise ValueError(f"Unknown backbone '{backbone}'")
    return YOLOv1(
        num_classes=num_classes, S=S, B=B, backbone=bb, dtype=dtype,
        quantized=quantized,
    )


def init_model(
    model: YOLOv1, rng: jax.Array, image_size: int = 448, batch_size: int = 1
) -> dict:
    """Initialize model variables ({'params': ..., 'batch_stats': ...}).

    The init runs under jit: eager flax init dispatches every layer's op
    individually, which is pathologically slow on remote-attached TPUs
    (~250s for ResNet50 over an axon tunnel vs ~1s jitted).
    """
    dummy = jnp.zeros((batch_size, image_size, image_size, 3), model.dtype)

    @jax.jit
    def _init(rng):
        return model.init({"params": rng}, dummy, train=False)

    return _init(rng)
