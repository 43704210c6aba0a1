"""Pallas TPU kernel: per-class greedy NMS as one fused VMEM-resident pass.

The serving graph's only sequential, non-MXU component is greedy NMS
(reference: host Python loops, src/yolo/inference.py:251-317). The XLA path
(yolo_tpu/ops/nms.py) runs it as an argsort + 98-step ``fori_loop`` over HBM
arrays; this kernel instead keeps all candidate state in VMEM and runs a
*selection-based* greedy loop, 8 images per program (one per sublane row):

    repeat K times (per row):
        best <- highest-score still-active candidate   (lane-wise max)
        keep[best] = True
        deactivate every active same-class candidate with IoU >= t vs best

This is mathematically identical to sort-then-scan greedy NMS (a candidate is
kept iff no higher-scored kept candidate of its class overlaps it), and the
first-max selection reproduces the reference's stable-sort tie-breaking
(lowest candidate index wins among equal scores). No sort is needed, so the
whole kernel is VPU element-wise ops + lane reductions over (8, 128) tiles —
the native VPU shape.

Scalar extraction of each row's selected candidate uses masked lane
reductions (sum over a one-hot lane mask) instead of dynamic lane indexing,
which Mosaic lowers poorly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolo_tpu.ops.decode import Detections

_NEG_INF = float("-inf")
_EPS = 1e-6
_ROWS = 8  # images per program = VPU sublane count


def _nms_kernel(
    scores_ref,
    x1_ref,
    y1_ref,
    x2_ref,
    y2_ref,
    area_ref,
    cls_ref,
    valid_ref,
    keep_ref,
    *,
    num_candidates: int,
    iou_threshold: float,
):
    rows, lanes = scores_ref.shape
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)

    scores = scores_ref[:]
    x1, y1 = x1_ref[:], y1_ref[:]
    x2, y2 = x2_ref[:], y2_ref[:]
    area = area_ref[:]  # w*h in center format (may be negative; parity)
    cls = cls_ref[:]
    # Carries are int32 masks: Mosaic cannot legalize vector<i1> loop carries
    # ("failed to legalize operation 'scf.for'").
    active0 = (valid_ref[:] != 0).astype(jnp.int32)
    keep0 = jnp.zeros_like(active0)

    def body(_, carry):
        active_i, keep_i = carry
        active = active_i != 0
        masked = jnp.where(active, scores, _NEG_INF)
        best_val = jnp.max(masked, axis=1, keepdims=True)  # (rows, 1)
        found = best_val > _NEG_INF
        # First-max lane per row: stable tie-break identical to the
        # reference's stable sort over decode order.
        is_best = (masked == best_val) & active
        best_lane = jnp.min(
            jnp.where(is_best, lane_idx, lanes), axis=1, keepdims=True
        )
        sel = lane_idx == best_lane  # (rows, lanes) one-hot per row

        def pick(v):
            return jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)

        bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
        barea = pick(area)
        bcls = jnp.sum(jnp.where(sel, cls, 0), axis=1, keepdims=True)

        inter_w = jnp.maximum(0.0, jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1))
        inter_h = jnp.maximum(0.0, jnp.minimum(y2, by2) - jnp.maximum(y1, by1))
        inter = inter_w * inter_h
        iou = inter / (area + barea - inter + _EPS)

        suppress = active & (cls == bcls) & (iou >= iou_threshold)
        keep = (keep_i != 0) | (sel & found)
        active = active & ~sel & ~suppress & found
        return active.astype(jnp.int32), keep.astype(jnp.int32)

    _, keep = jax.lax.fori_loop(0, num_candidates, body, (active0, keep0))
    keep_ref[:] = keep


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms(
    dets: Detections, iou_threshold: float = 0.4, interpret: bool = False
) -> Detections:
    """Per-class greedy NMS via the fused Pallas kernel.

    Drop-in equivalent of :func:`yolo_tpu.ops.nms.batched_nms` (same greedy
    semantics, same tie-breaking); ``interpret=True`` runs the kernel in
    interpreter mode for CPU tests.
    """
    batch_shape = dets.scores.shape[:-1]
    K = dets.scores.shape[-1]
    L = _round_up(max(K, 128), 128)
    n = 1
    for d in batch_shape:
        n *= d
    n_pad = _round_up(max(n, _ROWS), _ROWS)

    boxes = dets.boxes.reshape(n, K, 4).astype(jnp.float32)
    scores = dets.scores.reshape(n, K).astype(jnp.float32)
    cls = dets.class_ids.reshape(n, K).astype(jnp.int32)
    valid = dets.valid.reshape(n, K).astype(jnp.int32)

    cx, cy = boxes[..., 0], boxes[..., 1]
    w, h = boxes[..., 2], boxes[..., 3]
    x1, y1 = cx - w * 0.5, cy - h * 0.5
    x2, y2 = cx + w * 0.5, cy + h * 0.5
    area = w * h  # reference area semantics (center-format w*h, unclamped)

    def prep(v):
        return jnp.pad(v, ((0, n_pad - n), (0, L - K)))

    args = (
        prep(scores),
        prep(x1),
        prep(y1),
        prep(x2),
        prep(y2),
        prep(area),
        prep(cls),
        prep(valid),
    )

    spec = pl.BlockSpec((_ROWS, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    keep = pl.pallas_call(
        partial(
            _nms_kernel,
            num_candidates=K,
            iou_threshold=float(iou_threshold),
        ),
        grid=(n_pad // _ROWS,),
        in_specs=[spec] * len(args),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, L), jnp.int32),
        interpret=interpret,
    )(*args)

    keep_mask = (keep[:n, :K] != 0).reshape(*batch_shape, K) & dets.valid
    return dets._replace(valid=keep_mask)
