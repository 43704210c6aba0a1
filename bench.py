#!/usr/bin/env python
"""Headline benchmark: 448x448 inference + decode + NMS images/sec/chip.

Baseline (BASELINE.json): >= 5000 images/sec/chip on the flagship ResNet50
configuration with the full on-device postprocessing graph (decode + per-class
greedy NMS), zero per-image host syncs. Prints ONE JSON line.

Timing methodology: on remote-attached TPUs (axon tunnel),
``block_until_ready`` can acknowledge before execution completes, and a
single scalar fetch costs a ~200 ms round trip. So we (a) make every
iteration's output feed one final jitted reduction whose value is fetched to
the host — forcing completion of all work — and (b) report the MARGINAL
rate between a short and a long run, which cancels the fixed round-trip
latency. Median of 3 repeats damps tunnel noise.
"""

from __future__ import annotations

import json
import statistics
import time


def main():
    from yolo_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_yolo_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from yolo_tpu.inference import YOLOInference
    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model

    batch = 256
    dtype = jnp.bfloat16

    model = YOLOv1(
        num_classes=20, S=7, B=2, backbone=ResNetBackbone(dtype=dtype), dtype=dtype
    )
    variables = init_model(model, jax.random.PRNGKey(0))
    engine = YOLOInference(model, variables)

    imgs = jax.random.normal(
        jax.random.PRNGKey(1), (4, batch, 448, 448, 3), dtype
    )
    jax.block_until_ready(imgs)

    score_sum = jax.jit(lambda d: jnp.sum(d.scores))
    reduce = jax.jit(lambda sums: jnp.sum(jnp.stack(sums)))

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        sums = [
            score_sum(engine.predict_batch_arrays(imgs[i % 4], 0.25, 0.4))
            for i in range(iters)
        ]
        float(reduce(sums))  # single host fetch depending on ALL iterations
        return time.perf_counter() - t0

    # Warmup / compile.
    run(2)

    lo_iters, hi_iters = 8, 40
    rates = []
    for _ in range(3):
        t_lo = run(lo_iters)
        t_hi = run(hi_iters)
        marginal = (t_hi - t_lo) / (hi_iters - lo_iters)
        if marginal > 0:
            rates.append(batch / marginal)
    throughput = statistics.median(rates) if rates else 0.0

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
