#!/usr/bin/env python
"""Evaluation-pipeline throughput: forward + decode + NMS + mAP accumulation.

The reference's evaluation hot loop is HOST-side Python — an S×S×B decode
with an ``.item()`` sync per scalar, per-image greedy NMS, then 20 classes ×
10 IoU thresholds of greedy matching in numpy (reference
src/yolo/metrics.py:173-296, 343-442; SURVEY §3.2 ranks it the dominant
eval cost). This harness times OUR full evaluator — jitted forward + batched
decode/NMS + the lax.scan greedy matcher accumulating ON DEVICE — end to end
over synthetic batches, plus the final host-side compute() reduction.

Usage: python tools/bench_eval.py [--batch 64] [--batches 8] [--bf16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=448)
    ap.add_argument("--objects", type=int, default=6,
                    help="synthetic GT objects per image")
    ap.add_argument("--precise", action="store_true",
                    help="measure the DEFAULT precise=True path (f64 "
                         "decode/NMS/matching on the host CPU backend) "
                         "instead of the on-accelerator f32 throughput mode")
    args = ap.parse_args()

    from yolo_tpu.utils.platform import (
        machine_cache_dir,
        respect_jax_platforms_env,
    )

    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )

    from yolo_tpu.metrics import evaluate_model
    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model

    dtype = jnp.bfloat16
    model = YOLOv1(num_classes=20, S=7, B=2,
                   backbone=ResNetBackbone(dtype=dtype), dtype=dtype)
    variables = init_model(model, jax.random.PRNGKey(0),
                           image_size=args.image_size)

    rng = np.random.default_rng(0)
    S, B, C = 7, 2, 20
    batches = []
    for _ in range(args.batches):
        images = rng.normal(size=(args.batch, args.image_size,
                                  args.image_size, 3)).astype(np.float32)
        targets = np.zeros((args.batch, S, S, B * 5 + C), np.float32)
        for n in range(args.batch):
            for _ in range(args.objects):
                ci, cj = rng.integers(0, S, 2)
                if targets[n, ci, cj, 4] == 0:
                    targets[n, ci, cj, 0:5] = [
                        rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8),
                        rng.uniform(0.05, 0.4), rng.uniform(0.05, 0.4), 1.0,
                    ]
                    targets[n, ci, cj, 10 + int(rng.integers(0, C))] = 1.0
        batches.append((images, targets))

    # Pre-stage batches on device: over the axon tunnel the host->device
    # image feed runs at ~35 MB/s (tools/serve_bench.py) — 154 MB/batch
    # would swamp the measurement with an environment artifact a local-PCIe
    # production host does not have. Targets stay host-side (the metric
    # moves them itself).
    batches = [(jax.device_put(im), tg) for im, tg in batches]
    jax.block_until_ready([im for im, _ in batches])

    # Marginal-rate methodology: evaluate_model builds a fresh jit wrapper
    # per call, so any single call pays a fixed trace + compile-cache
    # deserialize (~30 s for the 448² forward on a 1-core host) that a real
    # eval amortizes over the whole dataset. Timing a short and a long run
    # and taking the difference cancels that fixed cost — the same
    # RTT-cancelling trick bench.py uses.
    precise = args.precise
    evaluate_model(model, variables, batches[:1], verbose=False,
                   precise=precise)  # warm cache

    # precise=False: measure the on-accelerator f32 pipeline (throughput
    # mode); --precise instead measures the DEFAULT path, which ships each
    # decoded batch to the host CPU backend and matches in native f64 (the
    # exactness the parity harness pins) — its cost is host-bound.
    t0 = time.perf_counter()
    evaluate_model(model, variables, batches[:1], verbose=False, precise=precise)
    t1 = time.perf_counter()
    results = evaluate_model(model, variables, batches, verbose=False,
                             precise=precise)
    t2 = time.perf_counter()

    short, full = t1 - t0, t2 - t1
    marginal_imgs = args.batch * (args.batches - 1)
    marginal = full - short
    print(f"fixed setup (trace + cached compile load): "
          f"~{short - 0.0:.1f} s per eval run")
    mode = "precise=True (f64 host CPU)" if precise else "precise=False (f32 on-device)"
    print(f"marginal: {marginal_imgs} images in {marginal:.3f} s  ->  "
          f"{marginal_imgs / marginal:7.1f} img/s "
          f"(forward+decode+NMS+mAP update+compute, steady-state, {mode})")
    print(f"sanity: mAP50={results['mAP50']:.4f} "
          f"recall={results['recall']:.4f} (untrained model — near zero)")


if __name__ == "__main__":
    main()
