"""Vectorized box-geometry primitives (center format: cx, cy, w, h).

Single source of truth for IoU across loss, NMS and mAP. The reference keeps
three divergent IoU implementations (src/yolo/loss.py:174-212,
src/yolo/inference.py:212-249, src/yolo/metrics.py:298-341); all three reduce to
corner-intersection over union with a 1e-6 stabilizer, which is what this module
implements once, fully batched, for XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-6


def center_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(... , 4) center-format boxes -> (... , 4) corner-format (x1, y1, x2, y2)."""
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    half_w, half_h = w * 0.5, h * 0.5
    return jnp.stack([cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1)


def corners_to_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """(... , 4) corner-format boxes -> (... , 4) center-format (cx, cy, w, h)."""
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of center-format boxes: w * h (reference: src/yolo/schemas.py:52-55)."""
    return boxes[..., 2] * boxes[..., 3]


def _intersection(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of corner-format boxes broadcast against each other."""
    lt = jnp.maximum(corners1[..., :2], corners2[..., :2])
    rb = jnp.minimum(corners1[..., 2:], corners2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def iou_cellwise(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = EPSILON
) -> jnp.ndarray:
    """Broadcasted element-wise IoU between center-format boxes.

    Shapes broadcast: e.g. (N, S, S, B, 4) vs (N, S, S, 1, 4) -> (N, S, S, B),
    matching the loss-side IoU semantics (reference: src/yolo/loss.py:174-212,
    ``inter / (union + 1e-6)``).

    ``eps=0.0`` reproduces the reference METRIC IoU exactly
    (src/yolo/metrics.py:298-341): plain ``inter / union`` with a
    union == 0 -> 0 guard, no stabilizer. The 1e-6 stabilizer nudges an
    exactly-threshold IoU (e.g. 0.5) just below it, flipping TP decisions
    under score/geometry ties — the loss and inference-NMS paths keep it
    (their reference counterparts have it), the mAP path must not.
    """
    inter = _intersection(center_to_corners(boxes1), center_to_corners(boxes2))
    union = box_area(boxes1) + box_area(boxes2) - inter
    if eps == 0.0:
        return jnp.where(union == 0.0, 0.0, inter / jnp.where(union == 0.0, 1.0, union))
    return inter / (union + eps)


def iou_pairwise(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = EPSILON
) -> jnp.ndarray:
    """All-pairs IoU: (..., A, 4) x (..., B, 4) -> (..., A, B).

    Used by on-device NMS and greedy mAP matching; replaces the reference's
    per-pair Python IoU calls (src/yolo/inference.py:212-249,
    src/yolo/metrics.py:298-341).
    """
    return iou_cellwise(boxes1[..., :, None, :], boxes2[..., None, :, :], eps=eps)
