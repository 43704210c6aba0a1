"""Batched on-device per-class greedy non-maximum suppression.

The reference runs NMS as a host-side Python loop over Detection objects
(src/yolo/inference.py:251-317) or tuples (src/yolo/metrics.py:258-296). Both
implement the same rule: process detections in descending confidence; a
detection is suppressed iff an already-kept detection of the SAME class has
IoU >= threshold with it. Here that exact greedy recurrence runs on device as a
fixed-length ``lax.fori_loop`` over K = S*S*B (= 98) score-sorted slots, with
the (K, K) IoU matrix computed in one shot on the VPU — batched over images, no
dynamic shapes, no host syncs.

Ordering parity: scores are sorted with a stable argsort over the (i, j, b)
decode order, matching Python's stable ``sorted`` over the reference's append
order for exact tie-breaking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_tpu.ops.boxes import iou_pairwise
from yolo_tpu.ops.decode import Detections


def _nms_single(
    boxes: jnp.ndarray,  # (K, 4)
    scores: jnp.ndarray,  # (K,)
    class_ids: jnp.ndarray,  # (K,)
    valid: jnp.ndarray,  # (K,)
    iou_threshold: float,
    eps: float,
) -> jnp.ndarray:
    """Greedy per-class NMS keep mask for one image (in original slot order)."""
    K = boxes.shape[0]
    # Invalid candidates must never suppress anything: sink them to the end.
    sort_key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-sort_key, stable=True)

    sb = boxes[order]
    sc = class_ids[order]
    sv = valid[order]

    iou = iou_pairwise(sb, sb, eps=eps)  # (K, K)
    same_class = sc[:, None] == sc[None, :]
    # suppress[j, i]: True when kept j (ranked above i) would suppress i.
    suppress = (iou >= iou_threshold) & same_class & sv[:, None] & sv[None, :]
    rank = jnp.arange(K)

    def body(i, keep):
        above = (rank < i) & keep & suppress[:, i]
        return keep.at[i].set(keep[i] & ~jnp.any(above))

    keep_sorted = jax.lax.fori_loop(0, K, body, sv)

    keep = jnp.zeros((K,), dtype=bool).at[order].set(keep_sorted)
    return keep


@partial(jax.jit, static_argnames=("iou_threshold", "eps"))
def batched_nms(
    dets: Detections, iou_threshold: float = 0.4, eps: float = None
) -> Detections:
    """Apply per-class greedy NMS over the last axis of batched Detections.

    Accepts Detections with shapes (..., K[, 4]); returns the same Detections
    with ``valid`` narrowed to the NMS survivors. Defaults to the reference's
    0.4 IoU threshold (src/yolo/inference.py:296, src/yolo/metrics.py:27).

    ``eps`` selects the IoU stabilizer: the inference engine's NMS uses 1e-6
    (reference inference.py:248, the default here); the mAP evaluator's NMS
    uses none (reference metrics.py:298-341 -> pass eps=0.0).
    """
    from yolo_tpu.ops.boxes import EPSILON

    if eps is None:
        eps = EPSILON
    batch_shape = dets.scores.shape[:-1]
    K = dets.scores.shape[-1]
    flat = Detections(
        boxes=dets.boxes.reshape(-1, K, 4),
        scores=dets.scores.reshape(-1, K),
        class_ids=dets.class_ids.reshape(-1, K),
        valid=dets.valid.reshape(-1, K),
    )
    keep = jax.vmap(_nms_single, in_axes=(0, 0, 0, 0, None, None))(
        flat.boxes, flat.scores, flat.class_ids, flat.valid, iou_threshold, eps
    )
    return dets._replace(valid=keep.reshape(*batch_shape, K))
