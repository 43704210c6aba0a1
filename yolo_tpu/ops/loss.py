"""Multi-part YOLOv1 loss as a pure, jittable function.

Reimplements the exact semantics of the reference loss
(src/yolo/loss.py:55-172) as masked vectorized XLA ops — no boolean gathers, no
data-dependent shapes, so the whole thing fuses into the training step:

- object cells: any target confidence slot > 0 (loss.py:98-99)
- target box = the target slot whose confidence is set (argmax over the
  confidence mask; slot 0 in practice) (loss.py:102-104)
- responsible predictor = argmax IoU vs the target box (loss.py:107-115)
- coordinate loss on responsible boxes: SSE on (x, y) plus SSE on
  sqrt(clamp(w|h, 1e-6)), weighted by lambda_coord (loss.py:125-139)
- object confidence target = the best IoU itself, WITHOUT stop-gradient —
  the reference does not detach it, so gradients flow through the IoU
  (loss.py:123, 142-146)
- no-object loss over every non-responsible box, including the losing box in
  object cells, weighted by lambda_noobj (loss.py:148-153)
- class SSE over object cells (loss.py:155-159)
- total = sum / batch_size (loss.py:162)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_tpu.ops.boxes import iou_cellwise

_SQRT_CLAMP = 1e-6


@partial(jax.jit, static_argnames=("S", "B", "C"))
def yolo_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    S: int = 7,
    B: int = 2,
    C: int = 20,
    lambda_coord: float = 5.0,
    lambda_noobj: float = 0.5,
    sample_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Compute the YOLOv1 loss for (N, S, S, B*5+C) predictions and targets.

    Returns (total_loss, components) where components holds per-batch-mean
    scalars for "total", "coord", "conf_obj", "conf_noobj", "class" — as device
    scalars (the caller decides when to sync to host, unlike the reference's
    per-step ``.item()`` syncs at loss.py:164-170).

    ``sample_mask`` (N,) bool/float excludes padded samples: their terms are
    zeroed and the normalizer becomes ``mask.sum()`` instead of N. With
    ``sample_mask=None`` the math is bit-identical to the unmasked path (the
    parity-pinned reference semantics).
    """
    N = predictions.shape[0]
    pred_boxes = predictions[..., : B * 5].reshape(N, S, S, B, 5)
    pred_cls = predictions[..., B * 5 :]
    target_boxes = targets[..., : B * 5].reshape(N, S, S, B, 5)
    target_cls = targets[..., B * 5 :]

    target_conf_mask = target_boxes[..., 4] > 0  # (N, S, S, B)
    obj_mask = jnp.any(target_conf_mask, axis=-1)  # (N, S, S)
    obj_f = obj_mask.astype(predictions.dtype)
    if sample_mask is not None:
        mask_f = sample_mask.astype(predictions.dtype)  # (N,)
        obj_f = obj_f * mask_f[:, None, None]

    # Select the target slot that actually holds the object.
    target_slot = jnp.argmax(target_conf_mask.astype(jnp.int32), axis=-1)
    target_box = jnp.take_along_axis(
        target_boxes[..., :4], target_slot[..., None, None], axis=3
    ).squeeze(3)  # (N, S, S, 4)

    # Responsible predictor: best IoU against the target box (no detach).
    ious = iou_cellwise(pred_boxes[..., :4], target_box[..., None, :])  # (N,S,S,B)
    best_box = jnp.argmax(ious, axis=-1)  # (N, S, S)
    best_iou = jnp.take_along_axis(ious, best_box[..., None], axis=-1).squeeze(-1)
    responsible = (
        jax.nn.one_hot(best_box, B, dtype=bool) & obj_mask[..., None]
    )  # (N, S, S, B)

    resp_box = jnp.take_along_axis(
        pred_boxes, best_box[..., None, None], axis=3
    ).squeeze(3)  # (N, S, S, 5)

    # Coordinate loss (responsible boxes in object cells only).
    xy_err = jnp.sum((resp_box[..., :2] - target_box[..., :2]) ** 2, axis=-1)
    wh_err = jnp.sum(
        (
            jnp.sqrt(jnp.clip(resp_box[..., 2:4], _SQRT_CLAMP))
            - jnp.sqrt(jnp.clip(target_box[..., 2:4], _SQRT_CLAMP))
        )
        ** 2,
        axis=-1,
    )
    coord_loss = lambda_coord * jnp.sum(obj_f * (xy_err + wh_err))

    # Object confidence loss: target is the (non-detached) best IoU.
    conf_obj_loss = jnp.sum(obj_f * (resp_box[..., 4] - best_iou) ** 2)

    # No-object confidence loss: every non-responsible box everywhere.
    noobj_sq = jnp.where(responsible, 0.0, pred_boxes[..., 4] ** 2)
    if sample_mask is not None:
        noobj_sq = noobj_sq * mask_f[:, None, None, None]
    conf_noobj_loss = lambda_noobj * jnp.sum(noobj_sq)

    # Classification loss over object cells.
    class_loss = jnp.sum(
        obj_f[..., None] * (pred_cls - target_cls) ** 2
    )

    if sample_mask is None:
        denom = N
    else:
        denom = jnp.maximum(jnp.sum(mask_f), 1.0)
    total = (coord_loss + conf_obj_loss + conf_noobj_loss + class_loss) / denom
    components = {
        "total": total,
        "coord": coord_loss / denom,
        "conf_obj": conf_obj_loss / denom,
        "conf_noobj": conf_noobj_loss / denom,
        "class": class_loss / denom,
    }
    return total, components


class YOLOLoss:
    """Callable wrapper mirroring the reference loss API (src/yolo/loss.py:7-53).

    ``loss = YOLOLoss(S=7, B=2, C=20)(predictions, targets)`` returns
    (total_loss, loss_dict) exactly like the reference module's forward.
    """

    def __init__(
        self,
        S: int = 7,
        B: int = 2,
        C: int = 20,
        lambda_coord: float = 5.0,
        lambda_noobj: float = 0.5,
    ):
        self.S = S
        self.B = B
        self.C = C
        self.lambda_coord = lambda_coord
        self.lambda_noobj = lambda_noobj

    def __call__(
        self, predictions: jnp.ndarray, targets: jnp.ndarray
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        return yolo_loss(
            predictions,
            targets,
            S=self.S,
            B=self.B,
            C=self.C,
            lambda_coord=self.lambda_coord,
            lambda_noobj=self.lambda_noobj,
        )

    # Parity alias for the reference's static helper (src/yolo/loss.py:174-212).
    @staticmethod
    def compute_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
        return iou_cellwise(boxes1, boxes2)
