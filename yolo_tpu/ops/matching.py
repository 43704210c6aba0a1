"""On-device greedy prediction-to-GT matching for mAP.

The reference matches predictions to ground truths with a nested Python loop
per (class, IoU threshold): confidence-sorted predictions greedily claim their
best-IoU unmatched GT (src/yolo/metrics.py:343-442). Because a prediction can
only match GTs in its own image and of its own class, and the global confidence
sort preserves each image's internal confidence order, the sequential matching
decomposes into INDEPENDENT per-image scans — which is exactly what this module
exploits: a ``lax.scan`` over the K score-sorted predictions of one image,
vmapped over IoU thresholds and over images. The only remaining host work is a
tiny sort/cumsum per class (yolo_tpu/metrics/map.py).

Semantics preserved:
- best GT = argmax IoU among same-class valid GTs, strict improvement
  (``iou > best``, first GT wins ties) with best initialized to 0
  (metrics.py:393-403)
- TP iff best_iou >= threshold and GT unclaimed; otherwise FP
  (metrics.py:406-413)
- each GT claimable once per (class, threshold) pass
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_tpu.ops.boxes import iou_pairwise


def _match_single_threshold(
    iou: jnp.ndarray,  # (K, G) pred x gt IoU, pre-masked to same-class valid
    pred_valid: jnp.ndarray,  # (K,) in score-sorted order
    threshold: jnp.ndarray,  # scalar
) -> jnp.ndarray:
    """Greedy scan over score-sorted predictions; returns TP flags (K,)."""
    G = iou.shape[1]

    def step(gt_taken, inputs):
        iou_row, valid = inputs
        best_gt = jnp.argmax(iou_row)  # first max wins, matching reference
        best_iou = iou_row[best_gt]
        is_tp = valid & (best_iou >= threshold) & ~gt_taken[best_gt]
        gt_taken = gt_taken.at[best_gt].set(gt_taken[best_gt] | is_tp)
        return gt_taken, is_tp

    _, tps = jax.lax.scan(step, jnp.zeros((G,), bool), (iou, pred_valid))
    return tps


@partial(jax.jit, static_argnames=())
def match_detections_masked(
    pred_boxes: jnp.ndarray,  # (N, K, 4)
    pred_scores: jnp.ndarray,  # (N, K)
    pred_class: jnp.ndarray,  # (N, K)
    pred_valid: jnp.ndarray,  # (N, K) post-NMS keep mask
    gt_boxes: jnp.ndarray,  # (N, G, 4)
    gt_class: jnp.ndarray,  # (N, G)
    gt_valid_masks: jnp.ndarray,  # (M, N, G) GT-filter variants (e.g. sizes)
    thresholds: jnp.ndarray,  # (T,)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched greedy matching over M GT-validity masks at once.

    The score sort and the (K, G) IoU matrix depend only on the predictions
    and GT boxes, so they are computed ONCE per image and reused across all
    M masks x T thresholds (the evaluator runs M=4 size filters — computing
    them per filter would quadruple this stage).

    Returns (tp, scores_sorted, class_sorted, valid_sorted) with shapes
    (N, M, T, K) / (N, K): TP flags for every prediction in score-sorted
    order, plus the sorted scores/classes/validity for host-side AP.
    """

    def per_image(pb, ps, pc, pv, gb, gc, gvm):
        order = jnp.argsort(-jnp.where(pv, ps, -jnp.inf), stable=True)
        pb_s, ps_s, pc_s, pv_s = pb[order], ps[order], pc[order], pv[order]
        # eps=0: the reference metric IoU has NO stabilizer
        # (metrics.py:298-341); 1e-6 would push an exactly-0.5 IoU below
        # the 0.5 threshold and flip that TP.
        iou = iou_pairwise(pb_s, gb, eps=0.0)  # (K, G)
        class_ok = pc_s[:, None] == gc[None, :]

        def for_mask(gv):
            iou_masked = jnp.where(class_ok & gv[None, :], iou, 0.0)
            return jax.vmap(
                lambda t: _match_single_threshold(iou_masked, pv_s, t)
            )(thresholds)  # (T, K)

        tp = jax.vmap(for_mask)(gvm)  # (M, T, K)
        return tp, ps_s, pc_s, pv_s

    return jax.vmap(per_image, in_axes=(0, 0, 0, 0, 0, 0, 1))(
        pred_boxes,
        pred_scores,
        pred_class,
        pred_valid,
        gt_boxes,
        gt_class,
        gt_valid_masks,
    )


def match_detections(
    pred_boxes: jnp.ndarray,
    pred_scores: jnp.ndarray,
    pred_class: jnp.ndarray,
    pred_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_class: jnp.ndarray,
    gt_valid: jnp.ndarray,  # (N, G)
    thresholds: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-mask wrapper over :func:`match_detections_masked`.

    Returns (tp (N, T, K), scores_sorted, class_sorted, valid_sorted).
    """
    tp, ps, pc, pv = match_detections_masked(
        pred_boxes,
        pred_scores,
        pred_class,
        pred_valid,
        gt_boxes,
        gt_class,
        gt_valid[None],
        thresholds,
    )
    return tp[:, 0], ps, pc, pv
