#!/usr/bin/env python
"""Serving latency: int8 engine device time per batch across batch sizes.

bench.py reports saturated throughput (b256); a serving deployment also
cares about the small-batch latency floor — how fast ONE request clears the
chip when the batcher can't fill a big batch. Reports device ms/batch and
the implied img/s for b in {1, 4, 16, 64, 256}.

Wall-clock on the axon tunnel adds a ~200 ms RTT per dispatch that a
production host (local PCIe) does not pay, so device time is the portable
number (the same methodology as bench.py).

Usage: python tools/bench_latency.py [--batches 1,4,16,64,256] [--iters 8]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,16,64,256")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--engine", choices=("int8", "bf16"), default="int8")
    args = ap.parse_args()

    from yolo_tpu.utils.platform import (
        machine_cache_dir,
        respect_jax_platforms_env,
    )

    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )

    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model
    from yolo_tpu.utils.timing import device_time_ms

    dtype = jnp.bfloat16
    model = YOLOv1(num_classes=20, S=7, B=2,
                   backbone=ResNetBackbone(dtype=dtype), dtype=dtype)
    variables = init_model(model, jax.random.PRNGKey(0))
    calib = jax.random.normal(jax.random.PRNGKey(1), (64, 448, 448, 3), dtype)

    if args.engine == "int8":
        from yolo_tpu.serving import build_int8_predict
        from yolo_tpu.serving.engine import default_impl

        fn, q = build_int8_predict(model, variables, [calib],
                                   impl=default_impl())
        predict = lambda im: fn(q, im, 0.25, 0.4)  # noqa: E731
    else:
        from yolo_tpu.inference import YOLOInference

        eng = YOLOInference(model, variables)
        predict = lambda im: eng.predict_batch_arrays(im, 0.25, 0.4)  # noqa: E731

    print(f"engine={args.engine}  448²  (device ms/batch | img/s)")
    for b in (int(s) for s in args.batches.split(",")):
        imgs = jax.random.normal(jax.random.PRNGKey(2), (b, 448, 448, 3),
                                 dtype)
        jax.block_until_ready(imgs)
        t = device_time_ms(predict, imgs, iters=args.iters, tag=f"lat_b{b}")
        print(f"  b={b:<4d} {t:8.3f} ms   {b / t * 1e3:7.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
