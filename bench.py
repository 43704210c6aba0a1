#!/usr/bin/env python
"""Headline benchmark: 448x448 inference + decode + NMS images/sec/chip.

Baseline (BASELINE.json): >= 5000 images/sec/chip on the flagship ResNet50
configuration with the full on-device postprocessing graph (decode + per-class
greedy NMS), zero per-image host syncs. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from yolo_tpu.inference import YOLOInference
    from yolo_tpu.models import ResNetBackbone, YOLOv1

    batch = 256
    iters = 20
    dtype = jnp.bfloat16

    model = YOLOv1(
        num_classes=20, S=7, B=2, backbone=ResNetBackbone(dtype=dtype), dtype=dtype
    )
    rng = jax.random.PRNGKey(0)
    init_images = jnp.zeros((batch, 448, 448, 3), dtype)
    variables = model.init({"params": rng}, init_images, train=False)
    engine = YOLOInference(model, variables)

    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 448, 448, 3), dtype)

    # Warmup (compile).
    out = engine.predict_batch_arrays(images, 0.25, 0.4)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(iters):
        out = engine.predict_batch_arrays(images, 0.25, 0.4)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    throughput = batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "inference_448_throughput",
                "value": round(throughput, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(throughput / 5000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
