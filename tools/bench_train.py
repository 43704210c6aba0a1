#!/usr/bin/env python
"""Training-step and input-pipeline throughput (developer benchmark).

Complements bench.py (the headline inference benchmark): measures
1. the full jitted optimizer step (fwd + loss + bwd + clip + Adam + BN update)
   on the flagship ResNet50 config at 448^2, device-time via jax.profiler;
2. the host data pipeline (decode + augment + batch) images/sec, which must
   exceed (1) to keep the chip fed.

Usage: python tools/bench_train.py [--batch 256] [--data-root DIR]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_step(batch: int, remat=False, fused_bn=False) -> None:
    import jax
    import jax.numpy as jnp

    from yolo_tpu.utils.platform import machine_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from yolo_tpu.models import ResNetBackbone, YOLOv1
    from yolo_tpu.training import Trainer, make_optimizer

    dtype = jnp.bfloat16
    model = YOLOv1(
        num_classes=20, S=7, B=2,
        backbone=ResNetBackbone(dtype=dtype, remat=remat, fused_bn=fused_bn),
        dtype=dtype,
    )
    tx = make_optimizer(1e-4, 5e-4, milestones_steps=[10**9])
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=448)

    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 448, 448, 3), dtype)
    targets = jnp.zeros((batch, 7, 7, 30), jnp.float32)
    targets = targets.at[:, 3, 3, 0:5].set(jnp.asarray([0.5, 0.5, 0.2, 0.2, 1.0]))
    targets = targets.at[:, 3, 3, 17].set(1.0)

    # Warmup / compile.
    state, parts = trainer._train_step(state, images, targets)
    float(parts["total"])

    iters = 6
    trace_dir = "/tmp/yolo_tpu_bench_train_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            state, parts = trainer._train_step(state, images, targets)
        float(parts["total"])

    files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    total_us = 0.0
    if files:
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
            and e.get("name", "").startswith("jit_train_step")
        )
    if total_us > 0:
        ms = total_us / 1e3 / iters
        tag = (f", remat={remat}" if remat else "") + (", fused-bn" if fused_bn else "")
        print(
            f"train step (b{batch}, 448^2, bf16{tag}): {ms:.1f} ms device"
            f" -> {batch / ms * 1e3:.0f} img/s/chip"
        )
    else:
        print("train step: no device events captured (profiler unavailable?)")


def bench_pipeline(data_root: str, batch: int, workers: int) -> None:
    from yolo_tpu.data import DataLoader, create_voc_datasets

    try:
        ds = create_voc_datasets(
            [("2007", "trainval")], download=False, root=data_root, augment=True
        )
    except (FileNotFoundError, ValueError) as exc:
        print(f"input pipeline: skipped (no dataset at {data_root}: {exc})")
        return
    batch = max(1, min(batch, len(ds) // 2))
    loader = DataLoader(ds, batch_size=batch, shuffle=True, num_workers=workers)
    n = 0
    t0 = time.perf_counter()
    for _ in range(4):  # small datasets: several passes for a stable rate
        for images, targets in loader:
            n += images.shape[0]
        if n >= 8 * batch:
            break
    dt = time.perf_counter() - t0
    if n == 0:
        print("input pipeline: skipped (dataset smaller than one batch)")
    else:
        print(
            f"input pipeline ({workers} workers, augment, b{batch}):"
            f" {n / dt:.0f} img/s host"
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--data-root", default="./data")
    p.add_argument("--num-workers", type=int, default=16)
    p.add_argument("--remat", nargs="?", const="block", default=False,
                   choices=["block", "stage"])
    p.add_argument("--fused-bn", action="store_true",
                   help="Pallas fused BN(+residual)+ReLU train path")
    args = p.parse_args()
    bench_step(args.batch, remat=args.remat, fused_bn=args.fused_bn)
    bench_pipeline(args.data_root, args.batch, args.num_workers)


if __name__ == "__main__":
    main()
