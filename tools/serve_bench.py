#!/usr/bin/env python
"""Sustained serving throughput: pipelined host feed into the int8 engine.

bench.py measures pure device time of one batch (the chip's capability).
This harness measures what a serving process actually sustains WALL-CLOCK:
a host thread prepares/normalizes batches while the device runs, and up to
``--depth`` predictions stay in flight (jax async dispatch), so host work,
transfer, and compute overlap. On the axon tunnel the per-call ~200 ms RTT
makes un-pipelined serving ~5x slower than the device time; depth-2
pipelining hides it (the production pattern for a TPU serving binary).

Usage: python tools/serve_bench.py [--batch 256] [--steps 24] [--depth 2]
       [--engine artifact.npz]
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import deque
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--depth", type=int, default=2,
                    help="max in-flight predictions (1 = fully synchronous)")
    ap.add_argument("--engine", default=None,
                    help="frozen engine artifact (.npz); default builds "
                         "from random-init weights")
    ap.add_argument("--image-size", type=int, default=448)
    args = ap.parse_args()

    from yolo_tpu.utils.platform import (
        machine_cache_dir, respect_jax_platforms_env,
    )

    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )

    from yolo_tpu.inference import YOLOInference
    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model

    dtype = jnp.bfloat16
    model = YOLOv1(num_classes=20, S=7, B=2,
                   backbone=ResNetBackbone(dtype=dtype), dtype=dtype)
    b, sz = args.batch, args.image_size
    if args.engine:
        engine = YOLOInference(model, None, image_size=sz, optimize="int8",
                               engine_artifact=args.engine)
    else:
        variables = init_model(model, jax.random.PRNGKey(0), image_size=sz)
        calib = [jax.random.normal(jax.random.PRNGKey(1), (64, sz, sz, 3),
                                   dtype)]
        engine = YOLOInference(model, variables, image_size=sz,
                               optimize="int8", calibration=calib)

    # Host batches: pre-generated numpy (stands in for the decode/normalize
    # pipeline's output; the loader thread cost is measured by the wall gap
    # between depths, not simulated here).
    rng = np.random.default_rng(0)
    host_batches = [
        rng.standard_normal((b, sz, sz, 3), dtype=np.float32)
        for _ in range(4)
    ]

    def run(depth: int) -> float:
        inflight: deque = deque()
        # Warmup/compile outside the timed window.
        d = engine.predict_batch_arrays(jnp.asarray(host_batches[0]), 0.25, 0.4)
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        for i in range(args.steps):
            x = jnp.asarray(host_batches[i % len(host_batches)])
            inflight.append(engine.predict_batch_arrays(x, 0.25, 0.4))
            while len(inflight) >= depth:
                jax.block_until_ready(inflight.popleft())
        while inflight:
            jax.block_until_ready(inflight.popleft())
        return time.perf_counter() - t0

    for depth in sorted({1, args.depth}):
        wall = run(depth)
        rate = args.steps * b / wall
        print(f"depth={depth}: {wall:.2f} s for {args.steps}x{b} images "
              f"-> {rate:.0f} img/s sustained (wall)")


if __name__ == "__main__":
    main()
