"""Jitted training/eval steps and the epoch-loop orchestrator.

TPU-native redesign of reference src/yolo/training/trainer.py:23-364:
- ONE compiled XLA program per optimizer step (forward + loss + backward +
  clip + Adam update + BN-stat update), with donated state buffers so params
  update in place in HBM.
- loss components accumulate on device; the host syncs once per log interval
  and once per epoch (the reference syncs 5 scalars with ``.item()`` on every
  batch, loss.py:164-170).
- bfloat16 compute flag replaces CUDA AMP + GradScaler (bf16 needs no loss
  scaling on TPU; reference trainer.py:69-83).
- data parallelism: batches land sharded over the mesh's 'data' axis and the
  gradient all-reduce rides ICI automatically via sharding propagation —
  replacing the reference's single-GPU Modal path (SURVEY.md §2.2).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from yolo_tpu.metrics import evaluate_model
from yolo_tpu.ops.loss import yolo_loss
from yolo_tpu.training.checkpoints import (
    save_best_map_model,
    save_best_model,
    save_checkpoint,
)
from yolo_tpu.training.logging import (
    log_batch_metrics,
    log_epoch_metrics,
    print_epoch_header,
    print_loss_metrics,
    print_map_metrics,
)

_LOSS_KEYS = ("total", "coord", "conf_obj", "conf_noobj", "class")


def _prep_images(images, dtype):
    """Cast a batch to the compute dtype, normalizing uint8 batches in-graph.

    Loaders running with ``normalize_host=False`` ship raw uint8 (4x smaller
    transfers); the dtype branch resolves at trace time.
    """
    if images.dtype == jnp.uint8:
        from yolo_tpu.data.transforms import device_normalize

        return device_normalize(images).astype(dtype)
    return images.astype(dtype)


@struct.dataclass
class TrainState:
    """Pure training state pytree (donated through the jitted step)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


class Trainer:
    """Builds and owns the jitted train/eval step functions.

    Args:
        model: linen YOLOv1 module.
        optimizer: optax GradientTransformation (see training.optim).
        mesh: optional ``jax.sharding.Mesh`` with a 'data' axis for DP (and
            optionally a 'model' axis used by the head's FC shardings).
        lambda_coord/lambda_noobj: loss weights (reference defaults 5.0/0.5).
    """

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        mesh=None,
        lambda_coord: float = 5.0,
        lambda_noobj: float = 0.5,
    ):
        self.model = model
        self.tx = optimizer
        self.mesh = mesh
        self.lambda_coord = lambda_coord
        self.lambda_noobj = lambda_noobj

        S, B, C = model.S, model.B, model.num_classes

        def train_step(state: TrainState, images, targets):
            rng, dropout_rng = jax.random.split(state.rng)

            def loss_fn(params):
                out, mutated = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    _prep_images(images, self.model.dtype),
                    train=True,
                    rngs={"dropout": dropout_rng},
                    mutable=["batch_stats"],
                )
                total, parts = yolo_loss(
                    out.astype(jnp.float32),
                    targets,
                    S=S,
                    B=B,
                    C=C,
                    lambda_coord=self.lambda_coord,
                    lambda_noobj=self.lambda_noobj,
                )
                return total, (parts, mutated["batch_stats"])

            (_, (parts, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                rng=rng,
            )
            return new_state, parts

        def eval_step(state: TrainState, images, targets, mask=None):
            out = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                _prep_images(images, self.model.dtype),
                train=False,
            )
            _, parts = yolo_loss(
                out.astype(jnp.float32),
                targets,
                S=S,
                B=B,
                C=C,
                lambda_coord=self.lambda_coord,
                lambda_noobj=self.lambda_noobj,
                sample_mask=mask,
            )
            return parts

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

    # ----------------------------------------------------------------- state
    def create_state(
        self, rng: jax.Array, image_size: int = 448, init_batch: int = 1
    ) -> TrainState:
        init_rng, state_rng = jax.random.split(rng)
        dummy = jnp.zeros((init_batch, image_size, image_size, 3), self.model.dtype)
        # Jitted init: eager flax init is per-op dispatch (minutes on a
        # remote-attached TPU); one compiled program takes ~a second.
        variables = jax.jit(
            lambda r: self.model.init({"params": r}, dummy, train=False)
        )(init_rng)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=state_rng,
        )
        if self.mesh is not None:
            state = self.shard_state(state)
        return state

    def shard_state(self, state: TrainState) -> TrainState:
        """Place state on the mesh (params per partition rules, rest replicated)."""
        from yolo_tpu.parallel import state_shardings

        return jax.device_put(state, state_shardings(self.mesh, state))

    def put_batch(self, *arrays):
        """Transfer host arrays, each sharded across the 'data' axis if meshed.

        Multi-host: each process holds a DISJOINT per-host batch (the sharded
        loader slice), so the global array must be assembled from the
        process-local shards — ``device_put`` would instead interpret every
        host's local batch as the same global array and silently drop
        (P-1)/P of the data.
        """
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from yolo_tpu.parallel import put_sharded

        return tuple(put_sharded(self.mesh, a) for a in arrays)

    # ----------------------------------------------------------------- loops
    def train_epoch(
        self,
        state: TrainState,
        dataloader,
        epoch: int,
        writer=None,
        log_interval: int = 10,
    ):
        """One epoch; returns (state, mean loss components dict)."""
        totals = {k: jnp.zeros(()) for k in _LOSS_KEYS}
        num_batches = 0
        start = time.time()
        n_loader = len(dataloader)

        for batch_idx, (images, targets) in enumerate(dataloader):
            images, targets = self.put_batch(images, targets)
            state, parts = self._train_step(state, images, targets)
            totals = {k: totals[k] + parts[k] for k in _LOSS_KEYS}
            num_batches += 1

            if (batch_idx + 1) % log_interval == 0:
                host_parts = {k: float(parts[k]) for k in _LOSS_KEYS}
                elapsed = time.time() - start
                print(
                    f"Epoch [{epoch}] Batch [{batch_idx + 1}/{n_loader}] "
                    f"Loss: {host_parts['total']:.4f} "
                    f"(coord: {host_parts['coord']:.4f}, "
                    f"conf_obj: {host_parts['conf_obj']:.4f}, "
                    f"conf_noobj: {host_parts['conf_noobj']:.4f}, "
                    f"class: {host_parts['class']:.4f}) "
                    f"Time: {elapsed:.2f}s"
                )
                log_batch_metrics(writer, host_parts, epoch, batch_idx, n_loader)
                start = time.time()

        mean = jax.device_get({k: totals[k] / max(num_batches, 1) for k in _LOSS_KEYS})
        return state, {k: float(v) for k, v in mean.items()}

    def validate(
        self,
        state: TrainState,
        dataloader,
        compute_map: bool = False,
        num_classes: Optional[int] = None,
    ) -> Dict[str, float]:
        """Validation loss pass, optionally with the full mAP suite.

        Ragged final batches (drop_last=False loaders) are zero-padded to the
        loader's batch size — mesh batch sharding needs a divisible batch dim —
        and masked out of the loss via ``sample_mask``, so every val image
        counts exactly once (reference semantics, trainer.py:253-276).
        """
        from yolo_tpu.data.loader import pad_batch

        totals = {k: jnp.zeros(()) for k in _LOSS_KEYS}
        num_batches = 0
        full_batch = getattr(dataloader, "batch_size", None)
        for images, targets in dataloader:
            n = images.shape[0]
            if full_batch is not None and n < full_batch:
                images, targets, n = pad_batch(images, targets, full_batch)
                mask = np.arange(full_batch) < n
                images, targets, mask = self.put_batch(images, targets, mask)
                parts = self._eval_step(state, images, targets, mask)
            else:
                images, targets = self.put_batch(images, targets)
                parts = self._eval_step(state, images, targets)
            totals = {k: totals[k] + parts[k] for k in _LOSS_KEYS}
            num_batches += 1
        results = {
            k: float(v)
            for k, v in jax.device_get(
                {k: totals[k] / max(num_batches, 1) for k in _LOSS_KEYS}
            ).items()
        }

        if compute_map:
            print("\n  Computing mAP metrics...")
            map_results = evaluate_model(
                self.model,
                {"params": state.params, "batch_stats": state.batch_stats},
                dataloader,
                num_classes=num_classes or self.model.num_classes,
                conf_threshold=0.01,
                nms_threshold=0.4,
                S=self.model.S,
                B=self.model.B,
                mesh=self.mesh,
            )
            for key in ("mAP50:95", "mAP50", "mAP75", "precision", "recall"):
                results[key] = map_results[key]
            for key in ("mAP50:95_small", "mAP50:95_medium", "mAP50:95_large"):
                if key in map_results:
                    results[key] = map_results[key]
        return results


def train(
    trainer: Trainer,
    state: TrainState,
    train_loader,
    val_loader,
    num_epochs: int,
    checkpoint_dir,
    lr_schedule_info: Optional[Dict] = None,
    save_frequency: int = 5,
    writer=None,
    compute_map: bool = False,
    map_frequency: int = 5,
    num_classes: int = 20,
    start_epoch: int = 1,
    best_val_loss_init: Optional[float] = None,
    best_map_init: Optional[float] = None,
    profile_dir: Optional[str] = None,
    use_orbax: bool = False,
) -> Dict[str, float]:
    """Epoch loop with the reference's checkpoint cadence (trainer.py:220-364).

    Saves yolo_latest.ckpt every epoch, yolo_epoch_{N}.ckpt at save_frequency,
    yolo_best.ckpt on val-loss improvement, yolo_best_map.ckpt on mAP50:95
    improvement; returns {best_val_loss, final_train_loss[, best_mAP50:95]}.
    """
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    best_val_loss = best_val_loss_init if best_val_loss_init is not None else float("inf")
    best_map = best_map_init if best_map_init is not None else 0.0
    final_train_loss = None

    for epoch in range(start_epoch, num_epochs + 1):
        print_epoch_header(epoch, num_epochs)
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)

        if profile_dir is not None and epoch == start_epoch:
            # Device trace of the first epoch (aux subsystem the reference
            # lacks — SURVEY.md §5; view in TensorBoard's profile plugin).
            with jax.profiler.trace(str(profile_dir)):
                state, train_losses = trainer.train_epoch(
                    state, train_loader, epoch, writer
                )
        else:
            state, train_losses = trainer.train_epoch(
                state, train_loader, epoch, writer
            )
        print_loss_metrics("Training", train_losses, epoch)

        print("\nValidating...")
        should_map = compute_map and (
            epoch % map_frequency == 0 or epoch == num_epochs
        )
        val_losses = trainer.validate(
            state, val_loader, compute_map=should_map, num_classes=num_classes
        )
        print_loss_metrics("Validation", val_losses, epoch)
        print_map_metrics(val_losses)

        if lr_schedule_info is not None:
            from yolo_tpu.training.optim import current_lr

            lr = current_lr(
                lr_schedule_info["lr"],
                lr_schedule_info["milestones_steps"],
                lr_schedule_info["decay_factor"],
                int(jax.device_get(state.step)),
            )
        else:
            lr = float("nan")
        print(f"Learning rate: {lr:.6f}")
        log_epoch_metrics(writer, train_losses, val_losses, lr, epoch)

        save_checkpoint(
            checkpoint_dir / "yolo_latest.ckpt", epoch, state, train_losses, val_losses
        )
        if epoch % save_frequency == 0:
            save_checkpoint(
                checkpoint_dir / f"yolo_epoch_{epoch}.ckpt",
                epoch,
                state,
                train_losses,
                val_losses,
            )
        if val_losses["total"] < best_val_loss:
            best_val_loss = val_losses["total"]
            save_best_model(
                checkpoint_dir / "yolo_best.ckpt",
                epoch,
                state,
                val_losses,
                "val_loss",
                best_val_loss,
            )
        if "mAP50:95" in val_losses and val_losses["mAP50:95"] > best_map:
            best_map = val_losses["mAP50:95"]
            save_best_map_model(
                checkpoint_dir / "yolo_best_map.ckpt",
                epoch,
                state,
                val_losses,
                best_map,
            )
        if use_orbax:
            # Async sharded per-epoch snapshots (TPU-idiomatic; multi-host
            # safe) alongside the reference-parity pickle files. Saved AFTER
            # the best-metric updates so a resume restores the best-so-far
            # tracking (best checkpoints are never overwritten by worse runs).
            from yolo_tpu.training.checkpoints import save_checkpoint_orbax

            save_checkpoint_orbax(
                checkpoint_dir,
                epoch,
                state,
                {"train_loss": train_losses["total"],
                 "val_loss": val_losses["total"],
                 "best_val_loss": best_val_loss,
                 "best_map": best_map},
            )
        final_train_loss = train_losses["total"]

    results = {"best_val_loss": best_val_loss, "final_train_loss": final_train_loss}
    if best_map > 0:
        results["best_mAP50:95"] = best_map
    return results
