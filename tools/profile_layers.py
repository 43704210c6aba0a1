#!/usr/bin/env python
"""Per-op device-time breakdown of the flagship inference graph.

Captures a jax.profiler trace of the jitted forward+decode+NMS program and
aggregates TPU device time per HLO op (fusions, convolutions, copies), so the
HBM-bound vs MXU-bound split is measurable instead of guessed. This is the
profiling companion to bench.py (PARITY.md "Performance").

Usage:
    python tools/profile_layers.py [--batch 512] [--top 40] [--quantized]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def collect_events(trace_dir):
    files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise SystemExit("no trace produced")
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    return [
        e
        for e in events
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="profile the int8 serving engine (XLA convs)")
    ap.add_argument("--int8-pallas", action="store_true",
                    help="profile the int8 engine with Pallas bottlenecks")
    ap.add_argument("--train", action="store_true",
                    help="profile the jitted optimizer step instead of "
                         "inference (companion to tools/bench_train.py)")
    ap.add_argument("--remat", nargs="?", const="block", default=False,
                    choices=["block", "stage"])
    ap.add_argument("--fused-bn", action="store_true",
                    help="with --train: use the Pallas fused BN+ReLU path")
    ap.add_argument("--image-size", type=int, default=448)
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

    dtype = jnp.bfloat16
    imgs = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.image_size, args.image_size, 3),
        dtype,
    )
    jax.block_until_ready(imgs)
    if args.train:
        # NOTE: branch BEFORE any inference-model init — a stale fp32
        # variables copy (~1.1 GB, fc1-dominated) pushed the b128 fused-BN
        # step over the HBM edge (RESOURCE_EXHAUSTED).
        from yolo_tpu.training import Trainer, make_optimizer

        model = YOLOv1(
            num_classes=20, S=7, B=2,
            backbone=ResNetBackbone(
                dtype=dtype, remat=args.remat, fused_bn=args.fused_bn
            ),
            dtype=dtype,
        )
        tx = make_optimizer(1e-4, 5e-4, milestones_steps=[10**9])
        trainer = Trainer(model, tx)
        state = trainer.create_state(
            jax.random.PRNGKey(0), image_size=args.image_size
        )
        targets = jnp.zeros((args.batch, 7, 7, 30), jnp.float32)
        targets = targets.at[:, 3, 3, 0:5].set(
            jnp.asarray([0.5, 0.5, 0.2, 0.2, 1.0])
        )
        targets = targets.at[:, 3, 3, 17].set(1.0)
        state, parts = trainer._train_step(state, imgs, targets)  # compile
        float(parts["total"])

        trace_dir = "/tmp/yolo_tpu_layer_trace_train"
        with jax.profiler.trace(trace_dir):
            for _ in range(args.iters):
                state, parts = trainer._train_step(state, imgs, targets)
            float(parts["total"])
        report(args, collect_events(trace_dir), "jit_train_step")
        return
    model = YOLOv1(
        num_classes=20, S=7, B=2,
        backbone=ResNetBackbone(dtype=dtype, quantized=args.quantized),
        dtype=dtype,
    )
    variables = init_model(
        model, jax.random.PRNGKey(0), image_size=args.image_size
    )
    if args.int8 or args.int8_pallas:
        from yolo_tpu.serving import build_int8_predict

        impl = None
        if args.int8_pallas:
            from yolo_tpu.serving.pallas_int8 import chain_pallas

            impl = {f"layer{s}": chain_pallas for s in (1, 2, 3)}
        predict, q = build_int8_predict(model, variables, [imgs[:64]],
                                        impl=impl)
        run = lambda im: predict(q, im, 0.25, 0.4)  # noqa: E731
        module_prefix = "jit__predict"
    else:
        engine = YOLOInference(model, variables)
        run = lambda im: engine.predict_batch_arrays(im, 0.25, 0.4)  # noqa: E731
        module_prefix = "jit__predict"
    out = run(imgs)
    float(jnp.sum(out.scores))  # warmup/compile

    trace_dir = "/tmp/yolo_tpu_layer_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            out = run(imgs)
            jax.block_until_ready(out)
        float(jnp.sum(out.scores))

    report(args, collect_events(trace_dir), module_prefix)


def report(args, events, module_prefix):
    # Steady-state module events only.
    module = [e for e in events if e.get("name", "").startswith(module_prefix)]
    total_us = sum(e["dur"] for e in module)
    per_op = collections.Counter()
    samples = {}
    for e in events:
        name = e.get("name", "")
        # Skip the whole-module events (each iteration's jit program run):
        # they duplicate the sum of their sub-ops and previously polluted
        # the per-op table/percentages.
        if name.startswith("jit_") or name.startswith(module_prefix):
            continue
        if name.isdigit():
            continue  # per-iteration module rows on some runtimes
        per_op[name] += e["dur"]
        if name not in samples:
            samples[name] = e.get("args", {})
    if total_us > 0:
        print(f"module total: {total_us} us over {args.iters} iters "
              f"-> {total_us / args.iters / 1e3:.2f} ms/iter, "
              f"{args.batch * args.iters / (total_us / 1e6):.0f} img/s")
    else:
        print(f"module total: no events matched prefix {module_prefix!r}; "
              "per-op table below still covers all traced ops")
    # NOTE: durations are reported PER ITERATION (sum over the trace divided
    # by --iters). Earlier revisions printed the raw multi-iteration sum,
    # which inflated every per-op cost by the iteration count and led to a
    # 4x-overstated BN-chain slack estimate (PARITY.md "Fused-BN
    # experiment" records the correction).
    print(f"{'op':<60} {'ms/iter':>9} {'%':>6}")
    op_total = sum(per_op.values())
    for name, dur in per_op.most_common(args.top):
        meta = samples[name]
        extra = ""
        for k in ("long_name", "tf_op", "source"):
            if meta.get(k):
                extra = str(meta[k])[:200]
                break
        print(f"{name:<60} {dur / args.iters / 1e3:>9.3f} "
              f"{dur / max(op_total, 1) * 100:>5.1f} {extra}")


if __name__ == "__main__":
    main()
