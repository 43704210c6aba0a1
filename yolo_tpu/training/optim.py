"""Optax optimizer matching the reference training recipe.

Reference recipe (train.py:177-192, trainer.py:79/93):
- Adam(lr=1e-4, weight_decay=5e-4) — torch Adam adds wd * p to the RAW gradient
  BEFORE the moment updates (L2-regularized Adam, not AdamW), applied to every
  parameter including biases and BN scales.
- global-norm gradient clipping at 10.0, applied BEFORE the optimizer sees the
  gradient (and before weight decay is added).
- MultiStepLR: lr *= 0.1 at epochs {75, 105}, stepped per epoch.
- backbone freezing = requires_grad False (models.py:156-158) -> here an optax
  ``multi_transform`` that zeroes frozen-partition updates (BN running stats
  still update through the mutable batch_stats collection, same as torch).
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def multistep_lr(
    base_lr: float,
    milestones_steps: Sequence[int],
    decay_factor: float = 0.1,
) -> optax.Schedule:
    """Piecewise-constant schedule: multiply by decay_factor at each boundary."""
    return optax.piecewise_constant_schedule(
        init_value=base_lr,
        boundaries_and_scales={int(s): decay_factor for s in milestones_steps},
    )


def freeze_labels(params, freeze_backbone: bool):
    """Label each param 'frozen'/'trainable' by top-level module path."""
    import jax

    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if freeze_backbone and top == "backbone":
            return "frozen"
        return "trainable"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 5e-4,
    milestones_steps: Sequence[int] = (),
    decay_factor: float = 0.1,
    clip_norm: float = 10.0,
    freeze_backbone: bool = False,
    params=None,
) -> optax.GradientTransformation:
    """Build the reference-equivalent optimizer chain.

    ``milestones_steps`` are in optimizer STEPS (the caller converts epoch
    milestones via steps_per_epoch, since optax schedules tick per update while
    torch's MultiStepLR ticks per epoch).
    """
    schedule = multistep_lr(learning_rate, milestones_steps, decay_factor)
    chain = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )
    if not freeze_backbone:
        return chain
    assert params is not None, "params needed to derive freeze partition"
    return optax.multi_transform(
        {"trainable": chain, "frozen": optax.set_to_zero()},
        freeze_labels(params, freeze_backbone=True),
    )


def current_lr(
    learning_rate: float,
    milestones_steps: Sequence[int],
    decay_factor: float,
    step: int,
) -> float:
    """Evaluate the schedule at a step (for logging parity: trainer.py:300)."""
    lr = learning_rate
    for boundary in sorted(milestones_steps):
        if step >= boundary:
            lr *= decay_factor
    return lr
