#!/usr/bin/env python
"""Serving CLI: an HTTP detection endpoint over the int8 engine.

TPU-build-only surface — the reference stops at a file-loop predict CLI
(/root/reference/src/predict.py:128-186); this serves the same model as a
production endpoint: requests coalesce through the RequestBatcher into
fixed-bucket jitted batches (yolo_tpu/serving/server.py).

Three ways to provide the engine, in decreasing build cost:
  --checkpoint CKPT [--calib-dir DIR]   fold + calibrate + quantize live
  --engine ART.npz                      frozen q-params (predict.py --save-engine)
  --compiled AOT.npz                    full StableHLO graph (save_compiled_engine)

Example:
  python serve.py --engine yolo_int8.npz --port 8000
  curl -s -X POST --data-binary @dog.jpg localhost:8000/predict
"""

from __future__ import annotations

import argparse
from pathlib import Path

# Shared threshold defaults (reference predict.py:214-221 semantics). The
# --conf/--nms flags use None sentinels (see parse_args), so every consumer —
# the live predict closure AND the --save-compiled AOT freeze — must resolve
# through these to keep a served model and its frozen artifact in agreement.
DEFAULT_CONF = 0.5
DEFAULT_NMS = 0.4


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Serve YOLOv1 over HTTP (TPU-native)")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", default=None)
    src.add_argument("--engine", default=None,
                     help="frozen int8 engine artifact (.npz)")
    src.add_argument("--compiled", default=None,
                     help="AOT StableHLO engine artifact (.npz); thresholds "
                          "and batch size are baked into the artifact")
    p.add_argument("--calib-dir", default=None,
                   help="directory of images for int8 activation calibration "
                        "(with --checkpoint; defaults to random noise with a "
                        "warning)")
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--backbone", default="resnet", choices=["resnet"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--image-size", type=int, default=448)
    # None sentinels so the --compiled path can tell an explicit flag from
    # the default when warning about baked-in thresholds.
    p.add_argument("--conf-threshold", type=float, default=None,
                   help="default 0.5")
    p.add_argument("--nms-threshold", type=float, default=None,
                   help="default 0.4")
    p.add_argument("--buckets", default="1,4,16",
                   help="comma-separated batch buckets (each compiles once)")
    p.add_argument("--max-delay-ms", type=float, default=2.0,
                   help="max wait for batch co-riders (latency knob)")
    p.add_argument("--save-compiled", default=None,
                   help="also freeze the built engine to an AOT artifact at "
                        "this path (batch = largest bucket)")
    return p.parse_args(argv)


def build_predict(args):
    """Returns (predict(images)->Detections, buckets, image_size, q_or_None,
    geom_or_None) where geom = (S, B, num_classes) of the engine built."""
    buckets = tuple(int(b) for b in args.buckets.split(","))

    if args.compiled:
        from yolo_tpu.serving import load_compiled_engine

        predict, meta = load_compiled_engine(args.compiled)
        for flag, key in (("conf_threshold", "conf_threshold"),
                          ("nms_threshold", "nms_threshold")):
            # Only warn when the flag was explicitly passed (None = default).
            if getattr(args, flag) is not None and \
                    abs(getattr(args, flag) - meta[key]) > 1e-9:
                print(f"note: --{flag.replace('_', '-')} ignored — the AOT "
                      f"artifact bakes {key}={meta[key]}")
        if meta["dtype"] != "uint8":
            raise SystemExit("serve.py requires a uint8-wire AOT artifact")
        # One lowered graph = one batch size: serve with that single bucket.
        return predict, (meta["batch_size"],), meta["image_size"], None, None

    from yolo_tpu.serving.engine import default_impl, make_int8_engine_fn

    if args.engine:
        from yolo_tpu.serving import load_engine

        q, meta = load_engine(args.engine)
        geom = (meta["S"], meta["B"], meta["num_classes"])
        fn = make_int8_engine_fn(*geom, impl=default_impl())
    else:
        from yolo_tpu.models import create_model
        from yolo_tpu.serving import build_int8_predict
        from yolo_tpu.training.checkpoints import load_variables

        if not Path(args.checkpoint).exists():
            raise SystemExit(f"Checkpoint not found: {args.checkpoint}")
        model = create_model(args.backbone, num_classes=args.num_classes)
        geom = (model.S, model.B, model.num_classes)
        variables = load_variables(args.checkpoint, backbone=args.backbone)
        calib = _calibration_batches(args)
        fn, q = build_int8_predict(model, variables, calib,
                                   impl=default_impl())

    conf = DEFAULT_CONF if args.conf_threshold is None else float(args.conf_threshold)
    nms = DEFAULT_NMS if args.nms_threshold is None else float(args.nms_threshold)
    return (lambda images: fn(q, images, conf, nms)), buckets, \
        args.image_size, q, geom


def _calibration_batches(args):
    import numpy as np

    size = args.image_size
    if args.calib_dir:
        from yolo_tpu.data.transforms import eval_transform, load_image_rgb

        paths = sorted(Path(args.calib_dir).iterdir())[:32]
        images = [
            eval_transform(load_image_rgb(str(p)), (size, size))
            for p in paths if p.suffix.lower() in
            {".jpg", ".jpeg", ".png", ".bmp"}
        ]
        if images:
            return [np.stack(images[i:i + 8])
                    for i in range(0, len(images), 8)]
    print("warning: calibrating int8 activation scales on random noise — "
          "pass --calib-dir with representative images for deployment")
    rng = np.random.default_rng(0)
    return [rng.standard_normal((8, size, size, 3)).astype(np.float32)
            for _ in range(2)]


def main(argv=None):
    args = parse_args(argv)

    from yolo_tpu.utils.platform import (
        respect_jax_platforms_env,
        setup_compilation_cache,
    )

    respect_jax_platforms_env()
    setup_compilation_cache()

    predict, buckets, image_size, q, geom = build_predict(args)

    if args.save_compiled:
        if q is None:
            raise SystemExit("--save-compiled needs a live or frozen engine "
                             "build (not --compiled)")
        from yolo_tpu.serving import save_compiled_engine

        save_compiled_engine(
            args.save_compiled, q, *geom,
            batch_size=buckets[-1], image_size=image_size,
            conf_threshold=DEFAULT_CONF if args.conf_threshold is None
            else float(args.conf_threshold),
            nms_threshold=DEFAULT_NMS if args.nms_threshold is None
            else float(args.nms_threshold),
        )
        print(f"AOT engine artifact saved to {args.save_compiled}")

    from yolo_tpu.serving import YOLOServer

    with YOLOServer(
        predict, image_size,
        host=args.host, port=args.port,
        buckets=buckets, max_delay_ms=args.max_delay_ms,
    ) as server:
        print(f"compiling {len(buckets)} bucket(s) {buckets} ...")
        server.warmup()
        print(f"serving on http://{server.host}:{server.port} "
              f"(POST /predict, GET /healthz); Ctrl-C to stop")
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            print("\nshutting down")


if __name__ == "__main__":
    main()
