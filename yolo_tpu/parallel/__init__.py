"""Device-mesh parallelism: DP batch sharding + TP sharding of the FC head.

The reference has NO multi-device support (single Modal GPU, SURVEY.md §2.2);
this package supplies the TPU-native replacement: a ``jax.sharding.Mesh`` over
ICI with a 'data' axis (batch-sharded inputs, gradient all-reduce inserted by
XLA) and an optional 'model' axis that column/row-shards the detection head's
dominant FC parameters (50176x4096 — the bulk of the model's parameters).
"""

from yolo_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    put_sharded,
    replicated,
    state_shardings,
    param_shardings,
)
from yolo_tpu.parallel.distributed import initialize_distributed

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "param_shardings",
    "put_sharded",
    "replicated",
    "state_shardings",
]
