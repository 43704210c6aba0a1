#!/usr/bin/env python
"""Training CLI — flag-compatible with the reference entry point.

Reference: src/train.py:268-295 exposes every hyperparameter as a flag with
defaults batch 64 / workers 32 / epochs 135 / lr 1e-4 / wd 5e-4 /
decay "75,105" x0.1 / lambda 5.0/0.5 / save_frequency 10 / map_frequency 5.
The Modal ``--remote`` GPU dispatch is replaced by TPU-native execution over a
``jax.sharding.Mesh`` (``--mesh-data`` / ``--mesh-model``); ``--use-amp`` maps
to bfloat16 compute (no loss scaling needed on TPU); ``--device`` is accepted
for compatibility but JAX picks the platform.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train YOLOv1 (TPU-native)")
    p.add_argument("--data-root", default="./data", help="VOC dataset root")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-workers", type=int, default=32)
    p.add_argument("--worker-type", default="auto",
                   choices=["auto", "thread", "process"],
                   help="data-loader workers: spawned processes (the "
                        "reference's 32-worker-process semantics, best on "
                        "multi-core hosts), GIL-sharing threads, or auto "
                        "(processes iff the host has >1 CPU)")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--freeze-backbone", action="store_true")
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--epochs", type=int, default=135)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--lr-decay-epochs", default="75,105")
    p.add_argument("--lr-decay-factor", type=float, default=0.1)
    p.add_argument("--lambda-coord", type=float, default=5.0)
    p.add_argument("--lambda-noobj", type=float, default=0.5)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--save-frequency", type=int, default=10)
    p.add_argument("--resume", default=None, help="'true' for latest, or a path")
    p.add_argument("--log-dir", default="runs")
    p.add_argument("--experiment-name", default=None)
    # Writer is on by default, matching the reference's unconditional
    # SummaryWriter (reference src/train.py:87-101); --tensorboard kept as an
    # accepted no-op for callers that passed it when it was opt-in.
    p.add_argument("--tensorboard", action="store_true",
                   help="accepted no-op; logging is on by default")
    p.add_argument("--no-tensorboard", action="store_true",
                   help="disable the TensorBoard/JSONL metric writer")
    p.add_argument("--compute-map", action="store_true")
    p.add_argument("--map-frequency", type=int, default=5)
    p.add_argument("--device", default=None, help="accepted for parity; unused")
    p.add_argument("--download-data", action="store_true")
    p.add_argument(
        "--remote",
        action="store_true",
        help="parity alias: initializes jax.distributed for multi-host",
    )
    p.add_argument(
        "--use-amp", action="store_true", help="bfloat16 compute (TPU-native AMP)"
    )
    p.add_argument("--backbone", default="resnet", choices=["resnet", "yolov1"])
    p.add_argument("--pretrained-backbone", default=None,
                   help="path to a torchvision resnet50 .pth for transfer learning")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh axis size (default: all devices)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel mesh axis size for the FC head")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image-size", type=int, default=448)
    p.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler device trace of the first training epoch"
        " into DIR (view with TensorBoard's profile plugin / xprof)",
    )
    p.add_argument(
        "--remat",
        nargs="?",
        const="block",
        default="none",
        choices=["none", "block", "stage"],
        help="rematerialize backbone activations in the backward pass: "
        "'block' (per-bottleneck, ~30% extra FLOPs) or 'stage' (checkpoint "
        "only stage boundaries — frees the per-block 112^2 tensors, enabling "
        "b256+ at 448^2); bare --remat means 'block'",
    )
    p.add_argument(
        "--orbax-checkpoints",
        action="store_true",
        help="additionally write async sharded orbax snapshots per epoch"
        " (checkpoint-dir/orbax/<epoch>); resume with --resume orbax",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from yolo_tpu.utils.platform import (
        respect_jax_platforms_env,
        setup_compilation_cache,
    )

    respect_jax_platforms_env()
    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from yolo_tpu.data import DataLoader, create_voc_datasets
    from yolo_tpu.models import ResNetBackbone, YOLOv1, YOLOv1Backbone
    from yolo_tpu.parallel import initialize_distributed, make_mesh
    from yolo_tpu.training import (
        MetricWriter,
        Trainer,
        load_checkpoint,
        log_hyperparameters,
        make_optimizer,
        train,
    )
    from yolo_tpu.training.checkpoints import find_resume_path
    from yolo_tpu.training.logging import (
        print_dataset_info,
        print_tensorboard_info,
        print_training_config,
    )

    if args.remote:
        initialize_distributed()

    checkpoint_dir = Path(args.checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)

    writer = None
    if not args.no_tensorboard:
        from datetime import datetime

        exp_name = args.experiment_name or (
            "yolo_" + datetime.now().strftime("%Y%m%d_%H%M%S")
        )
        log_dir = Path(args.log_dir) / exp_name
        writer = MetricWriter(log_dir)
        print_tensorboard_info(log_dir, args.log_dir)

    # Datasets: VOC 2007 trainval + 2012 train; val = 2012 val (train.py:104-124).
    print("\nCreating training dataset (VOC 2007 trainval + VOC 2012 train)...")
    train_dataset = create_voc_datasets(
        [("2007", "trainval"), ("2012", "train")],
        download=args.download_data,
        root=args.data_root,
        augment=not args.no_augment,
        target_size=(args.image_size, args.image_size),
        normalize_host=False,
    )
    print("Creating validation dataset (VOC 2012 val)...")
    val_dataset = create_voc_datasets(
        [("2012", "val")],
        download=args.download_data,
        root=args.data_root,
        augment=False,
        target_size=(args.image_size, args.image_size),
        normalize_host=False,
    )
    print_dataset_info(len(train_dataset), len(val_dataset), not args.no_augment)

    # Multi-host (--remote): each process loads its disjoint slice of the
    # identically-shuffled index stream; batch-size stays per-host.
    shard = bool(args.remote) and jax.process_count() > 1
    train_loader = DataLoader(
        train_dataset,
        batch_size=args.batch_size,
        shuffle=True,
        num_workers=args.num_workers,
        drop_last=True,
        seed=args.seed,
        shard_by_process=shard,
        worker_type=args.worker_type,
    )
    # drop_last=False: the reference evaluates every val image (its torch
    # DataLoader keeps the ragged final batch); the one extra jit shape
    # compiles once.
    val_loader = DataLoader(
        val_dataset,
        batch_size=args.batch_size,
        shuffle=False,
        num_workers=args.num_workers,
        drop_last=False,
        shard_by_process=shard,
        worker_type=args.worker_type,
    )

    dtype = jnp.bfloat16 if args.use_amp else jnp.float32
    if args.backbone == "resnet":
        backbone = ResNetBackbone(
            dtype=dtype,
            remat=False if args.remat == "none" else args.remat,
        )
    else:
        backbone = YOLOv1Backbone(dtype=dtype)
    model = YOLOv1(
        num_classes=args.num_classes, S=7, B=2, backbone=backbone, dtype=dtype
    )

    mesh = make_mesh(n_data=args.mesh_data, n_model=args.mesh_model)
    print(f"Mesh: {mesh}")
    n_data = mesh.shape["data"]
    if args.batch_size % n_data != 0:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the"
            f" data-parallel mesh axis ({n_data} devices); pass e.g."
            f" --batch-size {((args.batch_size // n_data) + 1) * n_data}"
            f" or --mesh-data <divisor of {args.batch_size}>"
        )

    milestones_epochs = [int(x) for x in args.lr_decay_epochs.split(",") if x.strip()]
    steps_per_epoch = len(train_loader)
    milestones_steps = [m * steps_per_epoch for m in milestones_epochs]

    # The freeze partition only needs the params TREE STRUCTURE (path-based
    # labels), so derive it with jax.eval_shape — no init compile — and build
    # the one real optimizer + Trainer + state in a single pass (a second
    # jitted init is the dominant cost on compile-bound hosts).
    if args.freeze_backbone:
        param_shapes = jax.eval_shape(
            lambda rng: model.init(
                {"params": rng},
                jnp.zeros((1, args.image_size, args.image_size, 3), model.dtype),
                train=False,
            ),
            jax.random.PRNGKey(args.seed),
        )["params"]
        tx = make_optimizer(
            args.lr, args.weight_decay, milestones_steps, args.lr_decay_factor,
            freeze_backbone=True, params=param_shapes,
        )
    else:
        tx = make_optimizer(args.lr, args.weight_decay, milestones_steps,
                            args.lr_decay_factor)
    trainer = Trainer(model, tx, mesh=mesh,
                      lambda_coord=args.lambda_coord,
                      lambda_noobj=args.lambda_noobj)
    state = trainer.create_state(jax.random.PRNGKey(args.seed),
                                 image_size=args.image_size)
    from yolo_tpu.training.logging import count_params, print_model_info

    print_model_info(*count_params(state.params, args.freeze_backbone))

    # Pretrained backbone import (replaces torchvision download).
    if args.pretrained_backbone:
        import torch

        from yolo_tpu.convert import convert_torchvision_resnet50

        sd = torch.load(args.pretrained_backbone, map_location="cpu",
                        weights_only=False)
        converted = convert_torchvision_resnet50(sd)
        params = dict(state.params)
        params["backbone"] = converted["params"]
        batch_stats = dict(state.batch_stats)
        batch_stats["backbone"] = converted["batch_stats"]
        state = state.replace(params=params, batch_stats=batch_stats)
        state = trainer.shard_state(state)
        print(f"Loaded pretrained backbone from {args.pretrained_backbone}")

    # Resume.
    start_epoch, best_val_loss, best_map = 1, None, None
    if args.resume == "orbax":
        from yolo_tpu.training.checkpoints import restore_checkpoint_orbax

        state, step, metrics = restore_checkpoint_orbax(checkpoint_dir, state)
        start_epoch = step + 1
        best_val_loss = metrics.get("best_val_loss", metrics.get("val_loss"))
        best_map = metrics.get("best_map") or None
        print(f"\nResumed from orbax step {step}, starting at {start_epoch}")
        resume_path = None
    else:
        resume_path = find_resume_path(args.resume, checkpoint_dir)
    if resume_path is not None:
        if resume_path.exists():
            print(f"\nResuming from checkpoint: {resume_path}")
            ckpt = load_checkpoint(resume_path)
            state = state.replace(
                params=ckpt["model_state_dict"]["params"],
                batch_stats=ckpt["model_state_dict"]["batch_stats"],
            )
            if ckpt.get("optimizer_state_dict") is not None:
                from yolo_tpu.training.checkpoints import restore_opt_state

                try:
                    opt_state = restore_opt_state(
                        state.opt_state, ckpt["optimizer_state_dict"]
                    )
                except ValueError as exc:
                    raise SystemExit(f"Cannot resume from {resume_path}: {exc}")
                state = state.replace(opt_state=opt_state)
            if "scheduler_state_dict" in ckpt:
                state = state.replace(
                    step=jnp.asarray(ckpt["scheduler_state_dict"]["step"], jnp.int32)
                )
            state = trainer.shard_state(state)
            start_epoch = int(ckpt.get("epoch", 0)) + 1
            best_val_loss = ckpt.get("val_loss")
            best_map = ckpt.get("mAP50:95")
            print(f"Resumed from epoch {ckpt.get('epoch', 0)}, starting at {start_epoch}")
        else:
            print(f"\nWarning: resume checkpoint not found at {resume_path}")
            print("Starting training from scratch")

    print_training_config(args)
    hparams = {
        k: v for k, v in vars(args).items() if isinstance(v, (int, float, str, bool))
    }
    try:
        final_metrics = train(
            trainer,
            state,
            train_loader,
            val_loader,
            num_epochs=args.epochs,
            checkpoint_dir=checkpoint_dir,
            lr_schedule_info={
                "lr": args.lr,
                "milestones_steps": milestones_steps,
                "decay_factor": args.lr_decay_factor,
            },
            save_frequency=args.save_frequency,
            writer=writer,
            compute_map=args.compute_map,
            map_frequency=args.map_frequency,
            num_classes=args.num_classes,
            start_epoch=start_epoch,
            best_val_loss_init=best_val_loss,
            best_map_init=best_map,
            profile_dir=args.profile,
            use_orbax=args.orbax_checkpoints,
        )
        log_hyperparameters(writer, hparams, final_metrics)
    finally:
        if writer is not None:
            writer.close()
        # Reap persistent worker-process pools deterministically (with
        # --worker-type auto/process each loader holds up to num_workers
        # spawned processes, each with a pickled dataset copy).
        train_loader.close()
        val_loader.close()
    print("\nTraining completed!")


if __name__ == "__main__":
    main()
