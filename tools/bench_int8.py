#!/usr/bin/env python
"""End-to-end serving benchmark: bf16 engine vs int8 engine (XLA / Pallas).

Measures device time of the full predict graph (forward + decode + NMS) at
the headline batch, per variant:
  bf16    — the exact-parity YOLOInference path (bench.py's current number)
  int8    — serving engine, XLA int8 convs everywhere
  int8+pl — serving engine with Pallas fused bottlenecks on selected stages

Usage: python tools/bench_int8.py [--batch 512] [--variants bf16,int8,pallas]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--variants", default="bf16,int8,pallas")
    ap.add_argument("--pallas-stages", default="1,2,3",
                    help="stages whose identity blocks use the fused kernel")
    ap.add_argument("--tile-rows", type=int, default=None)
    ap.add_argument("--t2-stages", default="2;3;2,3",
                    help="';'-separated stage lists for the Pallas "
                         "transition-conv2 variant, e.g. '2;3;2,3'")
    ap.add_argument("--wino-spec",
                    default="head_conv1;head_conv1,head_conv3,head_conv4",
                    help="';'-separated comma-lists of convs for the "
                         "Winograd variant, e.g. 'head_conv1;l3b1_conv2'")
    ap.add_argument("--retile-spec", default="layer2:2",
                    help="stage:tiles list for the retile variant, e.g. "
                         "'layer2:2,layer3:2'")
    args = ap.parse_args()

    from yolo_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()

    import jax
    import jax.numpy as jnp

    from yolo_tpu.utils.platform import machine_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )

    from yolo_tpu.inference import YOLOInference
    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model
    from yolo_tpu.serving import build_int8_predict
    from yolo_tpu.utils.timing import device_time_ms

    variants = args.variants.split(",")
    b = args.batch
    dtype = jnp.bfloat16
    model = YOLOv1(num_classes=20, S=7, B=2,
                   backbone=ResNetBackbone(dtype=dtype), dtype=dtype)
    variables = init_model(model, jax.random.PRNGKey(0))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 448, 448, 3), dtype)
    jax.block_until_ready(imgs)

    results = {}
    if "bf16" in variants:
        engine = YOLOInference(model, variables)
        t = device_time_ms(
            lambda im: engine.predict_batch_arrays(im, 0.25, 0.4), imgs,
            iters=args.iters, tag="bf16",
        )
        results["bf16"] = t

    calib = [imgs[:64]]
    if "int8" in variants:
        # The SHIPPED configuration (engine.default_impl: Pallas stem front
        # on TPU) — matches bench.py's headline graph.
        from yolo_tpu.serving.engine import default_impl

        predict, q = build_int8_predict(model, variables, calib,
                                        impl=default_impl())
        t = device_time_ms(lambda im: predict(q, im, 0.25, 0.4), imgs,
                           iters=args.iters, tag="int8")
        results["int8"] = t

    if "int8-xla" in variants:
        predict, q = build_int8_predict(model, variables, calib)
        t = device_time_ms(lambda im: predict(q, im, 0.25, 0.4), imgs,
                           iters=args.iters, tag="int8x")
        results["int8-xla"] = t

    if "colpack" in variants:
        # Column-superpixel-packed transition conv2s (engine-internal XLA
        # reformulation, bit-exact; see engine._conv3x3_s2_colpack_rq).
        from yolo_tpu.serving.engine import (
            _conv3x3_s2_colpack_rq, default_impl,
        )

        for spec in args.t2_stages.split(";"):
            impl = dict(default_impl())
            impl["transition_conv2"] = {
                f"layer{s}": _conv3x3_s2_colpack_rq
                for s in (int(x) for x in spec.split(","))
            }
            predict, q = build_int8_predict(model, variables, calib,
                                            impl=impl)
            t = device_time_ms(lambda im: predict(q, im, 0.25, 0.4), imgs,
                               iters=args.iters, tag="int8cp")
            results[f"int8+colpack({spec})"] = t

    if "wino" in variants:
        # Per-tap int8 Winograd F(2,3) on compute-bound 3x3/s1 convs
        # (serving/winograd.py; NOT bit-exact — accuracy gated separately
        # by tools/quant_accuracy.py --wino).
        from yolo_tpu.serving.engine import default_impl

        for spec in args.wino_spec.split(";"):
            wino = tuple(spec.split(","))
            predict, q = build_int8_predict(model, variables, calib,
                                            impl=default_impl(), wino=wino)
            t = device_time_ms(lambda im: predict(q, im, 0.25, 0.4), imgs,
                               iters=args.iters, tag="int8wg")
            results[f"int8+wino({spec})"] = t

    if "retile" in variants:
        impl = {"conv2_tiles": {
            s.split(":")[0]: int(s.split(":")[1])
            for s in args.retile_spec.split(",")
        }}
        predict, q = build_int8_predict(model, variables, calib, impl=impl)
        t = device_time_ms(lambda im: predict(q, im, 0.25, 0.4), imgs,
                           iters=args.iters, tag="int8rt")
        results[f"int8+retile({args.retile_spec})"] = t

    if "stem-direct" in variants:
        predict, q = build_int8_predict(model, variables, calib,
                                        stem_mode="direct")
        t = device_time_ms(lambda im: predict(q, im, 0.25, 0.4), imgs,
                           iters=args.iters, tag="int8sd")
        results["int8+stem-direct"] = t

    if "t2" in variants:
        from yolo_tpu.serving.pallas_int8 import transition_conv2_pallas

        for spec in args.t2_stages.split(";"):
            impl = {"transition_conv2": {
                f"layer{s}": transition_conv2_pallas
                for s in (int(x) for x in spec.split(","))
            }}
            predict, q = build_int8_predict(model, variables, calib, impl=impl)
            t = device_time_ms(lambda im: predict(q, im, 0.25, 0.4), imgs,
                               iters=args.iters, tag="int8t2")
            results[f"int8+t2({spec})"] = t

    if "pallas" in variants:
        from yolo_tpu.serving.pallas_int8 import chain_pallas

        impl = {
            f"layer{s}": chain_pallas
            for s in (int(x) for x in args.pallas_stages.split(","))
        }
        predict, q = build_int8_predict(model, variables, calib, impl=impl)
        t = device_time_ms(lambda im: predict(q, im, 0.25, 0.4), imgs,
                           iters=args.iters, tag="int8pl")
        results["int8+pallas"] = t

    print(f"batch={b}  (device ms/iter | img/s/chip)")
    for name, t in results.items():
        print(f"  {name:<12} {t:8.2f} ms  {b / t * 1000:8.0f} img/s")


if __name__ == "__main__":
    main()
