"""Batched on-device decode of YOLO grid outputs into flat box lists.

The reference decodes predictions with an S x S x B Python loop and a host
``.item()`` sync per scalar (src/yolo/inference.py:141-210,
src/yolo/metrics.py:173-218). Here the whole batch is decoded as one fixed-shape
XLA computation: every grid cell/box slot maps to one slot of a flat
(batch, S*S*B) candidate array with a validity mask — no dynamic shapes, no
host syncs, ideal for the TPU's vector unit.

Semantics preserved exactly:
- absolute coords: x_abs = (j + x_cell) / S, y_abs = (i + y_cell) / S
  (reference: src/yolo/inference.py:184-185, src/yolo/metrics.py:200-201)
- final confidence = box confidence * max class probability
  (reference: src/yolo/inference.py:193, src/yolo/metrics.py:211)
- class id = argmax over class probabilities, first max wins
  (reference: src/yolo/inference.py:190)
- strict threshold: final_conf > conf_threshold
  (reference: src/yolo/inference.py:195, src/yolo/metrics.py:213)
  The reference compares in float64 (``.item()`` Python floats); this decode
  compares in float32, so the operator is adjusted at trace time: when
  float32(threshold) > threshold (e.g. 0.1), a score EQUAL to the rounded
  threshold — the 0.1 * 1.0 case — is still above the true threshold in
  float64, so ``>=`` reproduces the reference bit-for-bit.
- flat candidate order is (i, j, b) row-major, matching the reference's
  append order (matters for stable tie-breaking downstream).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Detections(NamedTuple):
    """Fixed-shape batched detections with a validity mask.

    Attributes:
        boxes: (..., K, 4) center-format absolute normalized boxes.
        scores: (..., K) final confidence (objectness * class prob).
        class_ids: (..., K) int32 argmax class per candidate.
        valid: (..., K) bool, True for candidates above the confidence threshold
            (and, after NMS, surviving suppression).
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    class_ids: jnp.ndarray
    valid: jnp.ndarray


def decode_predictions(
    pred: jnp.ndarray,
    S: int,
    B: int,
    C: int,
    conf_threshold: float,
    s_divisor: jnp.ndarray | None = None,
) -> Detections:
    """Decode raw grid predictions (..., S, S, B*5+C) into flat detections.

    Returns Detections with K = S*S*B candidates per image, ordered (i, j, b).

    ``s_divisor``: optional TRACED scalar holding float(S). XLA rewrites
    division by a compile-time constant into multiplication by its reciprocal
    (off by 1 ulp from true division); the reference divides in Python floats.
    Passing S as a runtime argument forces a true divide — required for the
    parity-exact f64 evaluator path, irrelevant for serving.
    """
    batch_shape = pred.shape[:-3]
    boxes_raw = pred[..., : B * 5].reshape(*batch_shape, S, S, B, 5)
    class_probs = pred[..., B * 5 :]  # (..., S, S, C)

    # Cell-relative -> absolute centers.
    div = S if s_divisor is None else s_divisor
    i_idx = jnp.arange(S, dtype=pred.dtype)  # rows (y)
    j_idx = jnp.arange(S, dtype=pred.dtype)  # cols (x)
    x_abs = (j_idx[None, :, None] + boxes_raw[..., 0]) / div  # (..., S, S, B)
    y_abs = (i_idx[:, None, None] + boxes_raw[..., 1]) / div
    w = boxes_raw[..., 2]
    h = boxes_raw[..., 3]
    conf = boxes_raw[..., 4]

    class_id = jnp.argmax(class_probs, axis=-1)  # (..., S, S)
    class_prob = jnp.max(class_probs, axis=-1)
    score = conf * class_prob[..., None]  # (..., S, S, B)

    K = S * S * B
    boxes = jnp.stack([x_abs, y_abs, w, h], axis=-1).reshape(*batch_shape, K, 4)
    scores = score.reshape(*batch_shape, K)
    class_ids = (
        jnp.broadcast_to(class_id[..., None], class_id.shape + (B,))
        .reshape(*batch_shape, K)
        .astype(jnp.int32)
    )
    import numpy as np

    thr = np.dtype(scores.dtype).type(conf_threshold)
    if float(thr) > conf_threshold:  # threshold rounded UP in this dtype
        valid = scores >= thr
    else:
        valid = scores > thr
    return Detections(boxes=boxes, scores=scores, class_ids=class_ids, valid=valid)


def decode_ground_truth(
    target: jnp.ndarray,
    S: int,
    B: int,
    C: int,
    s_divisor: jnp.ndarray | None = None,
) -> Detections:
    """Decode YOLO targets (..., S, S, B*5+C) into flat ground-truth boxes.

    A cell holds an object iff its slot-0 confidence is > 0 (the target encoder
    only ever writes slot 0; reference: src/yolo/dataset.py:521-530, read back at
    src/yolo/metrics.py:239). One GT per cell -> K = S*S slots, ordered (i, j).
    ``scores`` is the slot-0 confidence (1.0 for real objects).
    """
    batch_shape = target.shape[:-3]
    x_cell = target[..., 0]
    y_cell = target[..., 1]
    w = target[..., 2]
    h = target[..., 3]
    conf0 = target[..., 4]
    class_probs = target[..., B * 5 :]

    div = S if s_divisor is None else s_divisor
    i_idx = jnp.arange(S, dtype=target.dtype)
    j_idx = jnp.arange(S, dtype=target.dtype)
    x_abs = (j_idx[None, :] + x_cell) / div
    y_abs = (i_idx[:, None] + y_cell) / div

    K = S * S
    boxes = jnp.stack([x_abs, y_abs, w, h], axis=-1).reshape(*batch_shape, K, 4)
    class_ids = jnp.argmax(class_probs, axis=-1).reshape(*batch_shape, K)
    valid = (conf0 > 0).reshape(*batch_shape, K)
    scores = conf0.reshape(*batch_shape, K)
    return Detections(
        boxes=boxes,
        scores=scores,
        class_ids=class_ids.astype(jnp.int32),
        valid=valid,
    )
