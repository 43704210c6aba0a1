#!/usr/bin/env python
"""Prediction CLI — flag parity with reference src/predict.py:188-293.

Single-image or directory batch prediction with annotated outputs
(``{stem}_pred{suffix}``) and a console summary.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Predict with YOLOv1 (TPU-native)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--freeze-backbone", action="store_true",
                   help="accepted for parity; unused at inference")
    p.add_argument("--image", default=None)
    p.add_argument("--image-dir", default=None)
    p.add_argument("--output", default="predictions")
    p.add_argument("--conf-threshold", type=float, default=0.5)
    p.add_argument("--nms-threshold", type=float, default=0.4)
    p.add_argument("--device", default=None, help="accepted for parity; unused")
    p.add_argument("--backbone", default="resnet", choices=["resnet", "yolov1"])
    p.add_argument("--int8", action="store_true",
                   help="serve with the int8-resident engine (resnet only)")
    p.add_argument("--engine", default=None,
                   help="load a saved int8 engine artifact (.npz from "
                        "--save-engine / serving.export) instead of "
                        "calibrating; implies --int8")
    p.add_argument("--save-engine", default=None,
                   help="after serving, freeze the calibrated int8 engine "
                        "to this .npz (deployment artifact; implies --int8)")
    p.add_argument("--force-save-engine", action="store_true",
                   help="allow --save-engine even when calibration saw fewer "
                        "than 8 images (e.g. a single --image run); the "
                        "frozen activation scales may clip on real data")
    args = p.parse_args(argv)
    if args.engine or args.save_engine:
        args.int8 = True
    if bool(args.image) == bool(args.image_dir):
        p.error("Provide exactly one of --image or --image-dir")
    return args


def load_engine(args):
    from yolo_tpu.inference import YOLOInference
    from yolo_tpu.models import create_model
    from yolo_tpu.training.checkpoints import load_variables

    if not Path(args.checkpoint).exists():
        raise SystemExit(f"Checkpoint not found: {args.checkpoint}")
    model = create_model(args.backbone, num_classes=args.num_classes)
    variables = load_variables(args.checkpoint, backbone=args.backbone)
    if args.int8 and args.backbone != "resnet":
        raise SystemExit("--int8 supports the resnet flagship only")
    return YOLOInference(
        model, variables, optimize="int8" if args.int8 else None,
        engine_artifact=args.engine,
    )


def report_and_save(engine, image_path: Path, detections, out_dir,
                    conf_threshold: float = 0.5):
    """Console listing + annotated ``{stem}_pred{suffix}`` output for one image.

    ``out_dir=None`` mirrors the reference's library-level fallback
    (reference predict.py:111-123): draw only when there are detections and
    display via ``PIL.Image.show()`` instead of saving (both CLIs default
    ``--output predictions``, so this path is library-only).
    """
    from yolo_tpu.data import VOC_CLASSES
    from yolo_tpu.utils.visualization import draw_detections

    print(f"\n{image_path}: {len(detections)} objects")
    for det in detections:
        print(f"  {det.class_name}: {det.confidence:.2%} at {det.bbox}")

    if out_dir is None and not detections:
        return detections
    image = engine.load_image(str(image_path))
    # Threshold threaded through like reference predict.py:113.
    annotated = draw_detections(image, detections, VOC_CLASSES, conf_threshold)
    if out_dir is None:
        try:
            annotated.show()
        except Exception:
            print("Could not display image (no display available)")
        return detections
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{image_path.stem}_pred{image_path.suffix}"
    annotated.save(out_path)
    print(f"  saved -> {out_path}")
    return detections


def predict_single_image(engine, image_path: Path, args, out_dir: Path):
    from yolo_tpu.data import VOC_CLASSES

    detections = engine.predict(
        str(image_path),
        conf_threshold=args.conf_threshold,
        nms_threshold=args.nms_threshold,
        class_names=VOC_CLASSES,
    )
    return report_and_save(
        engine, image_path, detections, out_dir, args.conf_threshold
    )


def _save_engine_cli(engine, args):
    """--save-engine with the calibration-count gate surfaced as CLI guidance.

    A single --image run lazily calibrates on ONE image; freezing those
    scales is the deployment footgun the gate exists for (see
    YOLOInference.save_engine). --force-save-engine overrides deliberately.
    """
    try:
        engine.save_engine(args.save_engine, force=args.force_save_engine)
    except RuntimeError as exc:
        raise SystemExit(
            f"{exc}\nCLI guidance: run with --image-dir over >="
            f" {type(engine).MIN_CALIB_IMAGES} representative images so the"
            f" engine calibrates on a full chunk, or pass"
            f" --force-save-engine to freeze anyway."
        )
    print(f"int8 engine artifact saved to {args.save_engine}")


def main(argv=None):
    args = parse_args(argv)

    from yolo_tpu.utils.platform import (
        respect_jax_platforms_env,
        setup_compilation_cache,
    )

    respect_jax_platforms_env()
    setup_compilation_cache()
    engine = load_engine(args)
    out_dir = Path(args.output)

    if args.image:
        predict_single_image(engine, Path(args.image), args, out_dir)
        if args.save_engine:
            _save_engine_cli(engine, args)
        return

    image_dir = Path(args.image_dir)
    exts = {".jpg", ".jpeg", ".png", ".bmp"}
    paths = sorted(
        p for p in image_dir.iterdir() if p.suffix.lower() in exts
    )
    if not paths:
        print(f"No images found in {image_dir}")
        return
    # Directory prediction is batched: one jitted forward per chunk of 16
    # files instead of a graph call per file (the framework's throughput
    # path, yolo_tpu/inference.py::predict_batch_files). With --int8 this
    # also calibrates activation scales on the first chunk of REAL images.
    from yolo_tpu.data import VOC_CLASSES

    all_dets = engine.predict_batch_files(
        [str(p) for p in paths],
        conf_threshold=args.conf_threshold,
        nms_threshold=args.nms_threshold,
        class_names=VOC_CLASSES,
    )
    total = 0
    for path, dets in zip(paths, all_dets):
        report_and_save(engine, path, dets, out_dir, args.conf_threshold)
        total += len(dets)
    if args.save_engine:
        _save_engine_cli(engine, args)
    print(
        f"\nProcessed {len(paths)} images, {total} detections "
        f"({total / len(paths):.1f} per image)"
    )


if __name__ == "__main__":
    main()
