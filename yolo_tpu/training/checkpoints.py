"""Checkpoint management: save/load full training state, plus .pth import.

File-role parity with the reference (training/checkpoints.py:11-114 and
trainer.py:307-351): ``yolo_latest`` every epoch, ``yolo_epoch_{N}`` at
save_frequency, ``yolo_best`` by val loss (no scheduler state), and
``yolo_best_map`` by mAP50:95 — with the same metadata keys
(epoch/train_loss/val_loss/mAP50:95/mAP50/mAP75). Payloads are
numpy-ified JAX pytrees in a single pickle file (.ckpt); reference .pth
checkpoints are importable via ``yolo_tpu.convert``.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from yolo_tpu.training.logging import print_checkpoint_saved

CHECKPOINT_VERSION = 1


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _save(path: Path, payload: Dict[str, Any]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)  # atomic on POSIX: no torn checkpoints on preemption


def save_checkpoint(
    checkpoint_path: str | Path,
    epoch: int,
    state,
    train_losses: Dict[str, float],
    val_losses: Dict[str, float],
) -> None:
    """Full checkpoint: model + optimizer + schedule step (resume-capable)."""
    payload = {
        "version": CHECKPOINT_VERSION,
        "epoch": epoch,
        "model_state_dict": {
            "params": _to_numpy(state.params),
            "batch_stats": _to_numpy(state.batch_stats),
        },
        "optimizer_state_dict": _to_numpy(state.opt_state),
        "scheduler_state_dict": {"step": int(state.step)},
        "train_loss": float(train_losses["total"]),
        "val_loss": float(val_losses["total"]),
    }
    if "mAP50:95" in val_losses:
        payload["mAP50:95"] = float(val_losses["mAP50:95"])
        payload["mAP50"] = float(val_losses["mAP50"])
        payload["mAP75"] = float(val_losses["mAP75"])
    _save(Path(checkpoint_path), payload)
    print_checkpoint_saved(checkpoint_path)


def save_best_model(
    checkpoint_path: str | Path,
    epoch: int,
    state,
    val_losses: Dict[str, float],
    metric_name: str,
    metric_value: float,
) -> None:
    """Best-by-val-loss checkpoint (no scheduler state, matching reference)."""
    payload = {
        "version": CHECKPOINT_VERSION,
        "epoch": epoch,
        "model_state_dict": {
            "params": _to_numpy(state.params),
            "batch_stats": _to_numpy(state.batch_stats),
        },
        "optimizer_state_dict": _to_numpy(state.opt_state),
        "val_loss": float(val_losses["total"]),
    }
    if "mAP50:95" in val_losses:
        payload["mAP50:95"] = float(val_losses["mAP50:95"])
        payload["mAP50"] = float(val_losses["mAP50"])
        payload["mAP75"] = float(val_losses["mAP75"])
    _save(Path(checkpoint_path), payload)
    print_checkpoint_saved(checkpoint_path, metric_name, metric_value)


def save_best_map_model(
    checkpoint_path: str | Path,
    epoch: int,
    state,
    val_losses: Dict[str, float],
    map_value: float,
) -> None:
    """Best-by-mAP50:95 checkpoint."""
    payload = {
        "version": CHECKPOINT_VERSION,
        "epoch": epoch,
        "model_state_dict": {
            "params": _to_numpy(state.params),
            "batch_stats": _to_numpy(state.batch_stats),
        },
        "optimizer_state_dict": _to_numpy(state.opt_state),
        "val_loss": float(val_losses["total"]),
        "mAP50:95": float(val_losses["mAP50:95"]),
        "mAP50": float(val_losses["mAP50"]),
        "mAP75": float(val_losses["mAP75"]),
    }
    _save(Path(checkpoint_path), payload)
    print_checkpoint_saved(checkpoint_path, "mAP@0.5:0.95", map_value)


def load_checkpoint(
    checkpoint_path: str | Path, backbone: str = "resnet"
) -> Dict[str, Any]:
    """Load a .ckpt payload (or import a reference .pth via the converter).

    ``backbone`` selects the reference layout for .pth imports ('resnet' or
    'yolov1' — their state-dict key schemas differ); ignored for .ckpt.
    """
    path = Path(checkpoint_path)
    if path.suffix == ".pth":
        from yolo_tpu.convert import load_pth_checkpoint

        return load_pth_checkpoint(path, backbone=backbone)
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_opt_state(template_opt_state, ckpt_opt_state):
    """Rebuild a checkpointed optimizer state in the CURRENT optimizer's
    structure, validating compatibility first.

    The checkpoint stores opt_state as a plain pytree; resuming unflattens its
    leaves into the live optimizer's structure. If the optimizer changed
    between save and resume (the classic case: ``--freeze-backbone`` toggled,
    which swaps the adam chain for a multi_transform partition), blind
    unflattening either crashes cryptically or silently mis-assigns Adam
    moments to the wrong parameters. Raises ValueError with a clear message
    instead.
    """
    t_leaves, t_struct = jax.tree.flatten(template_opt_state)
    c_leaves = jax.tree.leaves(ckpt_opt_state)
    if len(c_leaves) != len(t_leaves):
        raise ValueError(
            f"Checkpoint optimizer state has {len(c_leaves)} leaves but the"
            f" current optimizer expects {len(t_leaves)}. This usually means"
            " the optimizer configuration changed between save and resume"
            " (e.g. --freeze-backbone toggled). Resume with the original"
            " flags, or drop the optimizer state by training from the model"
            " weights only."
        )
    for i, (t, c) in enumerate(zip(t_leaves, c_leaves)):
        t_shape, c_shape = np.shape(t), np.shape(c)
        if t_shape != c_shape:
            raise ValueError(
                f"Checkpoint optimizer leaf {i} has shape {c_shape} but the"
                f" current optimizer expects {t_shape} — optimizer/model"
                " configuration mismatch (e.g. --freeze-backbone toggled or"
                " a different architecture). Resume with the original flags."
            )
    return jax.tree.unflatten(t_struct, c_leaves)


def load_variables(
    checkpoint_path: str | Path, backbone: str = "resnet"
) -> Dict[str, Any]:
    """Load just the model variables {'params', 'batch_stats'} for inference."""
    payload = load_checkpoint(checkpoint_path, backbone=backbone)
    msd = payload["model_state_dict"]
    return {"params": msd["params"], "batch_stats": msd.get("batch_stats", {})}


# ------------------------------------------------------------------- orbax
def save_checkpoint_orbax(
    checkpoint_dir: str | Path,
    step: int,
    state,
    metrics: Optional[Dict[str, float]] = None,
) -> None:
    """Async, sharded checkpoint via orbax (the TPU-idiomatic path).

    Unlike the pickle format (which device_gets the full state to one host),
    orbax writes each shard from its owning host/device — the right mechanism
    for multi-host meshes — and returns before the write completes (async).
    Layout: ``<dir>/orbax/<step>/``; restore with
    :func:`restore_checkpoint_orbax`.
    """
    import orbax.checkpoint as ocp

    path = (Path(checkpoint_dir) / "orbax").absolute()
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=3)
    ) as mngr:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        }
        mngr.save(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                metrics=ocp.args.JsonSave(
                    {k: float(v) for k, v in (metrics or {}).items()}
                ),
            ),
        )
        mngr.wait_until_finished()


def restore_checkpoint_orbax(
    checkpoint_dir: str | Path, state, step: Optional[int] = None
):
    """Restore a :func:`save_checkpoint_orbax` checkpoint into ``state``.

    Returns (state, step, metrics). ``state`` provides the pytree structure
    and shardings (restore is placed directly onto the mesh).
    """
    import orbax.checkpoint as ocp

    path = (Path(checkpoint_dir) / "orbax").absolute()
    with ocp.CheckpointManager(path) as mngr:
        step = int(step if step is not None else mngr.latest_step())
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        }
        restored = mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                metrics=ocp.args.JsonRestore(),
            ),
        )
    loaded = restored["state"]
    new_state = state.replace(
        params=loaded["params"],
        batch_stats=loaded["batch_stats"],
        opt_state=loaded["opt_state"],
        step=loaded["step"],
        rng=loaded["rng"],
    )
    return new_state, step, restored["metrics"]


def find_resume_path(
    resume: Optional[str], checkpoint_dir: str | Path
) -> Optional[Path]:
    """Resolve --resume semantics (reference train.py:199-208): 'true'/True ->
    <dir>/yolo_latest.ckpt, else the explicit path; None if flag unset."""
    if not resume:
        return None
    if resume in (True, "true", "True"):
        return Path(checkpoint_dir) / "yolo_latest.ckpt"
    return Path(resume)
