#!/usr/bin/env python
"""Evaluation CLI — flag parity with reference src/evaluate.py:17-294.

Runs the batched on-device evaluator (forward + decode + NMS + greedy matching
jitted per batch) and prints overall, size-based and per-class tables, then
writes ``evaluation_results.txt`` beside the checkpoint.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate YOLOv1 (TPU-native)")
    p.add_argument("--checkpoint", required=True, help=".ckpt or reference .pth")
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--freeze-backbone", action="store_true",
                   help="accepted for parity; unused at eval time")
    p.add_argument("--year", default="2007")
    p.add_argument("--image-set", default="test")
    p.add_argument("--datasets", default=None,
                   help="combined spec, e.g. '2007:trainval,2012:train'")
    p.add_argument("--data-root", default="./data")
    p.add_argument("--download-data", action="store_true")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--conf-threshold", type=float, default=0.01)
    p.add_argument("--nms-threshold", type=float, default=0.4)
    p.add_argument("--device", default=None, help="accepted for parity; unused")
    p.add_argument("--backbone", default="resnet", choices=["resnet", "yolov1"])
    p.add_argument("--use-bf16", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="evaluate through the int8-resident serving engine "
                        "(yolo_tpu/serving; resnet backbone only); measures "
                        "the deployed-quantized accuracy")
    p.add_argument("--engine", default=None,
                   help="evaluate a frozen int8 engine artifact (.npz from "
                        "predict.py --save-engine / serving.save_engine): "
                        "exactly what the serving box runs, no fold or "
                        "calibration (checkpoint still loaded for model "
                        "geometry)")
    p.add_argument("--calib-data", default=None,
                   help="dataset spec for int8 activation calibration, e.g. "
                        "'2007:trainval' (same --data-root). Default: the "
                        "first eval batches — fine for scale estimation but "
                        "leaks eval data into the deployed constants; prefer "
                        "a train split for deployment numbers")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="shard evaluation over N devices on the mesh 'data' "
                        "axis (the reference's loop is single-GPU, "
                        "metrics.py:654-714; a v5e-8 evaluates 8x)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel axis size for the mesh (forward "
                        "only; combine with --mesh-data)")
    p.add_argument("--fast-eval", action="store_true",
                   help="keep decode/NMS/matching in f32 on the accelerator "
                        "(throughput mode; tools/bench_eval.py). Default is "
                        "the precise path: f64 matching on the host CPU — "
                        "bit-faithful to the reference at AP tie boundaries, "
                        "but host-bound (slow on small-CPU hosts)")
    return p.parse_args(argv)


def format_results(results: dict, num_classes: int, class_names) -> str:
    lines = []
    lines.append("=" * 60)
    lines.append("Overall metrics")
    lines.append("=" * 60)
    for key in ("mAP50:95", "mAP50", "mAP75", "precision", "recall"):
        lines.append(f"  {key:12s}: {results[key] * 100:.2f}%")
    lines.append("")
    lines.append("Size-based metrics")
    lines.append("-" * 60)
    for size in ("large", "medium", "small"):
        lines.append(
            f"  {size:7s}: mAP50:95 {results[f'mAP50:95_{size}'] * 100:6.2f}% | "
            f"mAP50 {results[f'mAP50_{size}'] * 100:6.2f}% | "
            f"objects {results[f'num_{size}_objects']}"
        )
    lines.append("")
    lines.append("Per-class AP (sorted by AP50:95)")
    lines.append("-" * 60)
    per_class = sorted(
        range(num_classes),
        key=lambda c: -results.get(f"AP50:95_class_{c}", 0.0),
    )
    lines.append(f"  {'class':14s} {'AP50':>8s} {'AP75':>8s} {'AP50:95':>8s}")
    for c in per_class:
        name = class_names[c] if c < len(class_names) else f"class_{c}"
        lines.append(
            f"  {name:14s} "
            f"{results.get(f'AP50_class_{c}', 0.0) * 100:7.2f}% "
            f"{results.get(f'AP75_class_{c}', 0.0) * 100:7.2f}% "
            f"{results.get(f'AP50:95_class_{c}', 0.0) * 100:7.2f}%"
        )
    return "\n".join(lines)


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

    # fp32 eval path for mAP parity with the reference (which evaluates in
    # full precision); --use-bf16 opts into the fast MXU path.
    if not args.use_bf16:
        jax.config.update("jax_default_matmul_precision", "highest")

    from yolo_tpu.data import VOC_CLASSES, DataLoader, create_voc_datasets
    from yolo_tpu.metrics import evaluate_model
    from yolo_tpu.models import create_model
    from yolo_tpu.training.checkpoints import load_checkpoint, load_variables

    # Dataset (single split or combined spec; evaluate.py:102-132).
    if args.datasets:
        pairs = [tuple(item.split(":")) for item in args.datasets.split(",")]
    else:
        pairs = [(args.year, args.image_set)]
    dataset = create_voc_datasets(
        pairs,
        download=args.download_data,
        root=args.data_root,
        augment=False,
        normalize_host=False,
    )
    loader = DataLoader(
        dataset,
        batch_size=args.batch_size,
        shuffle=False,
        num_workers=args.num_workers,
        drop_last=False,
    )
    print(f"Evaluation dataset: {len(dataset)} images")

    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    model = create_model(args.backbone, num_classes=args.num_classes, dtype=dtype)

    ckpt_path = Path(args.checkpoint)
    if not ckpt_path.exists():
        raise SystemExit(f"Checkpoint not found: {ckpt_path}")
    payload = load_checkpoint(ckpt_path, backbone=args.backbone)
    variables = {
        "params": payload["model_state_dict"]["params"],
        "batch_stats": payload["model_state_dict"].get("batch_stats", {}),
    }
    print(f"Loaded checkpoint {ckpt_path}")
    for key in ("epoch", "val_loss", "mAP50:95"):
        if key in payload:
            print(f"  {key}: {payload[key]}")

    forward_fn = None
    if args.engine:
        # Frozen deployment artifact: no fold, no calibration — evaluate
        # exactly what the serving box runs (serving/export.py).
        from yolo_tpu.serving.engine import default_impl, int8_forward
        from yolo_tpu.serving.export import load_engine as load_artifact
        from yolo_tpu.serving.winograd import wino_impl_hooks, wino_points_of

        q, meta = load_artifact(args.engine)
        for attr in ("S", "B", "num_classes"):
            want = getattr(model, attr)
            if meta[attr] != want:
                raise SystemExit(
                    f"engine artifact {args.engine}: {attr}={meta[attr]}"
                    f" != model {want}"
                )
        impl = default_impl()
        if args.mesh_data or args.mesh_model > 1:
            impl.pop("stem_front", None)
        wino = wino_points_of(q)
        if wino:  # artifact was exported with Winograd convs — keep them
            impl = wino_impl_hooks(wino, impl)
        variables = q
        print(f"int8 engine artifact: {args.engine}")

        def forward_fn(qparams, images):
            return int8_forward(qparams, images, S=model.S, impl=impl)

    elif args.int8:
        if args.backbone != "resnet":
            raise SystemExit("--int8 supports the resnet flagship only")
        from yolo_tpu.data.transforms import device_normalize
        from yolo_tpu.serving import (
            calibrate_activations, fold_flagship, quantize_folded,
        )
        from yolo_tpu.serving.engine import default_impl, int8_forward

        folded = fold_flagship(variables)
        if args.calib_data:
            # Held-out calibration split: the deployed artifact's activation
            # scales must not be fit on the eval set being measured.
            calib_pairs = [
                tuple(item.split(":")) for item in args.calib_data.split(",")
            ]
            calib_ds = create_voc_datasets(
                calib_pairs,
                download=args.download_data,
                root=args.data_root,
                augment=False,
                normalize_host=False,
            )
            calib_loader = DataLoader(
                calib_ds, batch_size=args.batch_size, shuffle=False,
                num_workers=args.num_workers, drop_last=False,
            )
            calib_src = f"--calib-data {args.calib_data}"
        else:
            calib_loader = loader
            calib_src = "first eval batches (pass --calib-data for held-out)"
        calib = []
        for images, _ in calib_loader:
            images = jnp.asarray(images)
            if images.dtype == jnp.uint8:
                images = device_normalize(images)
            calib.append(images.astype(jnp.float32))
            if len(calib) >= 2:
                break
        print(f"int8 calibration source: {calib_src}")
        act_max = calibrate_activations(folded, calib, dtype=jnp.bfloat16)
        q = quantize_folded(folded, act_max)
        impl = default_impl()
        if args.mesh_data or args.mesh_model > 1:
            # The Mosaic stem-front custom call has no GSPMD partitioning
            # rule: under a sharded mesh it cannot be split across devices.
            # The XLA stem front computes the identical int8 result.
            impl.pop("stem_front", None)
        variables = q  # threaded through evaluate_model as the "variables"

        def forward_fn(qparams, images):
            return int8_forward(qparams, images, S=model.S, impl=impl)

        print("int8 serving engine: calibrated on"
              f" {sum(c.shape[0] for c in calib)} images")

    mesh = None
    if args.mesh_model > 1 and not args.mesh_data:
        # --mesh-model alone previously fell through to a single-device run
        # with no warning; default the data axis to 1 so the flag acts.
        args.mesh_data = 1
    if args.mesh_data:
        from yolo_tpu.parallel import make_mesh

        n_needed = args.mesh_data * args.mesh_model
        devices = jax.devices()
        if len(devices) < n_needed:
            raise SystemExit(
                f"--mesh-data {args.mesh_data} x --mesh-model"
                f" {args.mesh_model} needs {n_needed} devices;"
                f" only {len(devices)} visible"
            )
        if args.batch_size % args.mesh_data != 0:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by"
                f" --mesh-data {args.mesh_data} (batches are sharded over"
                " the mesh 'data' axis)"
            )
        mesh = make_mesh(
            n_data=args.mesh_data, n_model=args.mesh_model,
            devices=devices[:n_needed],
        )
        print(f"Evaluation mesh: {dict(mesh.shape)}")

    if not args.fast_eval:
        # The default matches the reference's f64 Python-float matching
        # exactly; its decode/NMS/match stage runs on the HOST CPU backend
        # (see mAPMetric), so on small-CPU hosts wall time is host-bound.
        print("Precise eval path active (f64 matching on host CPU); pass"
              " --fast-eval for the on-accelerator f32 throughput mode.")

    results = evaluate_model(
        model,
        variables,
        loader,
        num_classes=args.num_classes,
        conf_threshold=args.conf_threshold,
        nms_threshold=args.nms_threshold,
        forward_fn=forward_fn,
        mesh=mesh,
        precise=not args.fast_eval,
    )

    report = format_results(results, args.num_classes, VOC_CLASSES)
    print("\n" + report)

    out_path = ckpt_path.parent / "evaluation_results.txt"
    out_path.write_text(report + "\n")
    print(f"\nResults written to {out_path}")
    return results


if __name__ == "__main__":
    main()
