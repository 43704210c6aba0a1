"""Inference-optimized serving pipeline (TPU-native).

The training graph (flax modules, BN in eval mode, bf16 compute) is already
fast, but serving at BASELINE's >=5k img/s/chip needs fewer HBM bytes and the
MXU's int8 path. This subpackage builds a specialized serving executor from
trained variables — the TPU analogue of the TensorRT-style deploy step the
reference leaves to torch eval mode:

- ``fold``: BN folding -> a flat eval-time parameter struct.
- ``quant``: post-training int8 quantization (per-channel weights, calibrated
  per-tensor activations) and requantization constants.
- ``engine``: the jitted int8-resident forward (XLA dots/convs + Pallas fused
  bottleneck kernels) with the standard decode+NMS tail.

The default ``YOLOInference`` path is untouched (exact parity is load-bearing
there); serving mode is opt-in via ``YOLOInference(..., optimize="int8")``.
"""

from yolo_tpu.serving.fold import fold_flagship, folded_forward
from yolo_tpu.serving.quant import (
    ACT_POINTS,
    calibrate_activations,
    quantize_folded,
)
from yolo_tpu.serving.batcher import RequestBatcher
from yolo_tpu.serving.engine import build_int8_predict, make_int8_engine_fn
from yolo_tpu.serving.export import (
    load_compiled_engine,
    load_engine,
    save_compiled_engine,
    save_engine,
)
from yolo_tpu.serving.server import YOLOServer

__all__ = [
    "fold_flagship",
    "folded_forward",
    "ACT_POINTS",
    "calibrate_activations",
    "quantize_folded",
    "RequestBatcher",
    "build_int8_predict",
    "make_int8_engine_fn",
    "save_engine",
    "load_engine",
    "save_compiled_engine",
    "load_compiled_engine",
    "YOLOServer",
]
