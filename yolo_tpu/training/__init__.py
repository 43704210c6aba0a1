"""Training subsystem: optimizer, jitted train/eval steps, checkpoints, logging.

Parity surface with reference src/yolo/training/__init__.py:19-40:
``train``, ``train_epoch``, ``validate``, ``save_checkpoint``,
``save_best_model``, ``save_best_map_model``, ``log_batch_metrics``,
``log_epoch_metrics``, ``log_hyperparameters`` and the console printers.
"""

from yolo_tpu.training.checkpoints import (
    load_checkpoint,
    save_best_map_model,
    save_best_model,
    save_checkpoint,
)
from yolo_tpu.training.logging import (
    MetricWriter,
    log_batch_metrics,
    log_epoch_metrics,
    log_hyperparameters,
    print_checkpoint_saved,
    print_epoch_header,
    print_loss_metrics,
    print_map_metrics,
)
from yolo_tpu.training.optim import make_optimizer
from yolo_tpu.training.trainer import TrainState, Trainer, train

__all__ = [
    "MetricWriter",
    "TrainState",
    "Trainer",
    "load_checkpoint",
    "log_batch_metrics",
    "log_epoch_metrics",
    "log_hyperparameters",
    "make_optimizer",
    "print_checkpoint_saved",
    "print_epoch_header",
    "print_loss_metrics",
    "print_map_metrics",
    "save_best_map_model",
    "save_best_model",
    "save_checkpoint",
    "train",
]
