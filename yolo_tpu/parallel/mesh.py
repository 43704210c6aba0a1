"""Mesh construction and sharding rules.

Shardings are expressed as ``NamedSharding`` trees and handed to ``jax.jit``
via device_put placement; XLA's SPMD partitioner then inserts the ICI
collectives (psum for DP grad reduction, all-gather/reduce-scatter around the
TP FC layers) — no hand-written communication, per the scaling-book recipe.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to pure DP over every device (the v5e-8 target layout:
    data=8, model=1). ``n_model`` > 1 carves a TP axis for the FC head.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(mesh: Mesh, array):
    """Place one host batch array on the mesh, leading dim over 'data'.

    Multi-host processes hold disjoint per-host slices, so the global array is
    assembled from process-local shards; single-host uses a plain device_put.
    The leading dim must be divisible by the 'data' axis size — callers pad
    ragged batches first (see ``yolo_tpu.data.pad_batch``).
    """
    sharding = batch_sharding(mesh, array.ndim)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, array)
    return jax.device_put(array, sharding)


def _param_spec(path, leaf) -> P:
    """Partition rule for one parameter leaf.

    The detection head's FC stack dominates parameter count (fc1 kernel is
    50176 x 4096 ≈ 200M of the ~270M ResNet-flagship params). Megatron-style:
    fc1 column-parallel (out dim on 'model'), fc2 row-parallel (in dim on
    'model') — one all-reduce per head forward, inserted by XLA.
    Everything else (convs, BN) is replicated: at YOLO sizes the conv weights
    are small and DP gradient reduction handles them.
    """
    keys = [p.key if hasattr(p, "key") else str(p) for p in path]
    if getattr(leaf, "ndim", 0) >= 1 and "kernel" in keys[-1:]:
        if "fc1" in keys:
            return P(*([None] * (leaf.ndim - 1)), "model")  # column parallel
        if "fc2" in keys:
            return P("model", *([None] * (leaf.ndim - 1)))  # row parallel
    if getattr(leaf, "ndim", 0) >= 1 and "bias" in keys[-1:] and "fc1" in keys:
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree for a params pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), params
    )


def state_shardings(mesh: Mesh, state):
    """Shardings for a full TrainState: params per rules, opt-state moments
    follow their params, everything else replicated."""
    p_shard = param_shardings(mesh, state.params)

    def opt_spec(leaf_path, leaf):
        # Adam mu/nu pytrees mirror params; reuse the same rule by path tail.
        return NamedSharding(mesh, _param_spec(leaf_path, leaf))

    opt_shard = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    rep = replicated(mesh)
    return type(state)(
        step=rep,
        params=p_shard,
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=opt_shard,
        rng=rep,
    )
