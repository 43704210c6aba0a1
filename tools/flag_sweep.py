#!/usr/bin/env python
"""XLA:TPU compiler-flag / autotune sweep over the shipped graphs.

VERDICT r4 item 2: the per-op roofline ledger attributes the remaining
4,239-vs-5,000 img/s gap to XLA's strided/N=64 int8 conv shapes, but that
claim was only one flag-configuration deep. This tool runs the timeboxed
matrix: each candidate XLA:TPU option set is compiled into the SHIPPED int8
serving graph (and optionally the b128 train step) and measured by device
time, producing the flags-tried table for PARITY.md.

Mechanics: the axon TPU compiles server-side, so ``XLA_FLAGS`` set in this
host's environment is NOT a reliable way to reach the compiler. Instead each
configuration rides the per-compile PJRT options:

    fn.lower(*args).compile(compiler_options={...})

which JAX forwards in the compile request. Unknown/rejected options raise at
compile time and are recorded as ``rejected`` — a rejection row still
documents the surface probed. Everything runs in ONE process = ONE TPU
client (CLAUDE.md trap 4), lowering once per graph and compiling per config.

There is no exposed conv-algorithm autotuner on TPU (unlike GPU cudnn
autotuning): conv lowering is fully determined by the compiler, so flags +
scheduler/fusion/memory knobs ARE the available autotune surface.

Usage:
    python tools/flag_sweep.py [--graph serving|train|both] [--batch 256]
                               [--train-batch 128] [--iters 6] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Candidate option sets. Names are XLA debug options (the part after
# ``--`` in XLA_FLAGS). Values must be strings. Each entry: (tag, options).
# Singles first, then hand-written combos of the measured winners (the
# vmem64+* rows) — extend the list by hand when adding new candidates.
SERVING_CONFIGS = [
    ("baseline", {}),
    # Scheduler: latency-hiding scheduler can reorder DMA vs compute.
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    # Scoped VMEM ceiling (KiB): governs how big fusions' working sets may
    # be; v5e has 128 MiB VMEM/core. Default is ~16 MiB-class.
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # Fusion shape knobs.
    ("dot_dot_fusion_off", {"xla_tpu_dot_dot_fusion": "false"}),
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    ("licm_inflation_2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    # Memory-space-assignment (prefetch) model knobs.
    ("msa_bw_scale_2x",
     {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("msa_bw_scale_half",
     {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"}),
    ("prefetch_retry",
     {"xla_tpu_retry_memory_space_assignment_on_oom": "true"}),
    # Loop/emitter knobs that have shipped in libtpu at various points;
    # rejections are informative.
    ("mbl_optimizer_on", {"xla_tpu_memory_bound_loop_optimizer": "true"}),
    ("aggressive_opt", {"xla_backend_optimization_level": "3"}),
    ("no_rematerialization", {"xla_tpu_enable_rematerialization": "false"}),
    # Refinement around the round-5 winner (64 MiB scoped VMEM) — the
    # 48-80 MiB rows document the flat optimum; combos check whether the
    # neutral singles become wins once fusions are VMEM-rich.
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem_56m", {"xla_tpu_scoped_vmem_limit_kib": "57344"}),
    ("vmem_72m", {"xla_tpu_scoped_vmem_limit_kib": "73728"}),
    ("vmem_80m", {"xla_tpu_scoped_vmem_limit_kib": "81920"}),
    ("vmem64+lhs_on", {"xla_tpu_scoped_vmem_limit_kib": "65536",
                       "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem64+msa_bw_2x",
     {"xla_tpu_scoped_vmem_limit_kib": "65536",
      "xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("vmem64+licm_2x", {"xla_tpu_scoped_vmem_limit_kib": "65536",
                        "xla_tpu_licm_size_inflation_ratio": "2.0"}),
]

TRAIN_CONFIGS = [
    ("baseline", {}),
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("msa_bw_scale_2x",
     {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("no_rematerialization", {"xla_tpu_enable_rematerialization": "false"}),
]


def _device_ms(run_once, iters: int, trace_tag: str) -> float:
    """Steady-state device ms/iter of ``run_once()`` via profiler trace."""
    import jax

    from yolo_tpu.utils.timing import _module_device_us

    out = run_once()
    jax.block_until_ready(out)
    trace_dir = f"/tmp/yolo_tpu_flag_sweep_{trace_tag}"
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = run_once()
            jax.block_until_ready(out)
    total_us = _module_device_us(trace_dir)
    return total_us / 1e3 / iters if total_us > 0 else float("nan")


def sweep_serving(batch: int, iters: int):
    import os

    import jax
    import jax.numpy as jnp

    # The shipped engine jit bakes utils.platform.tpu_compiler_options()
    # into its own compile params, and per-compile options passed to
    # lowered.compile() merge ON TOP of those — so without this reset the
    # "baseline" row silently measures the production 64 MiB scoped-VMEM
    # setting instead of XLA's true default (observed: baseline == vmem_64m
    # == 55.69 ms in the round-5 refinement run). Neutralize it so every
    # row is exactly its own opts dict.
    os.environ["YOLO_TPU_SCOPED_VMEM_KIB"] = "0"

    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model
    from yolo_tpu.serving import build_int8_predict
    from yolo_tpu.serving.engine import default_impl

    dtype = jnp.bfloat16
    model = YOLOv1(num_classes=20, S=7, B=2,
                   backbone=ResNetBackbone(dtype=dtype), dtype=dtype)
    variables = init_model(model, jax.random.PRNGKey(0))
    imgs = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 448, 448, 3), dtype)
    fn, q = build_int8_predict(model, variables, [imgs[:64]],
                               impl=default_impl())
    lowered = fn.lower(q, imgs, 0.25, 0.4)

    rows = []
    for tag, opts in SERVING_CONFIGS:
        rows.append(_run_config(lowered, (q, imgs), tag, opts, iters,
                                batch=batch))
    return rows


def sweep_train(batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from yolo_tpu.models import ResNetBackbone, YOLOv1
    from yolo_tpu.training import Trainer, make_optimizer

    dtype = jnp.bfloat16
    model = YOLOv1(num_classes=20, S=7, B=2,
                   backbone=ResNetBackbone(dtype=dtype), dtype=dtype)
    tx = make_optimizer(1e-4, 5e-4, milestones_steps=[10**9])
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=448)
    images = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 448, 448, 3), dtype)
    targets = jnp.zeros((batch, 7, 7, 30), jnp.float32)
    targets = targets.at[:, 3, 3, 0:5].set(
        jnp.asarray([0.5, 0.5, 0.2, 0.2, 1.0]))
    targets = targets.at[:, 3, 3, 17].set(1.0)

    # Use the PRODUCTION donated step and thread the returned state into the
    # next call: donation reuses the ~3 GB param/opt buffers in place. The
    # earlier non-donating re-jit dropped a full state copy per timed call,
    # and the tunnel backend's lazy buffer freeing turned that churn into
    # RESOURCE_EXHAUSTED (CLAUDE.md trap 4) when the train sweep ran after
    # the serving sweep in one process.
    lowered = trainer._train_step.lower(state, images, targets)

    holder = {"state": state}
    rows = []
    for tag, opts in TRAIN_CONFIGS:
        rows.append(_run_config(lowered, (images, targets), tag, opts,
                                iters, batch=batch, state_holder=holder))
    return rows


def _run_config(lowered, call_args, tag, opts, iters, batch,
                state_holder=None):
    print(f"--- {tag}: {opts or '(default)'}", flush=True)
    try:
        compiled = lowered.compile(compiler_options=dict(opts))
    except Exception as exc:  # noqa: BLE001 - rejection rows are the data
        msg = str(exc).splitlines()[0][:160]
        print(f"    rejected: {msg}", flush=True)
        return {"tag": tag, "opts": opts, "status": "rejected", "error": msg}
    if state_holder is None:
        run_once = lambda: compiled(*call_args)  # noqa: E731
    else:
        def run_once():
            new_state, parts = compiled(state_holder["state"], *call_args)
            state_holder["state"] = new_state  # donated input is consumed
            return parts
    try:
        ms = _device_ms(run_once, iters, tag)
    except Exception as exc:  # noqa: BLE001
        msg = str(exc).splitlines()[0][:160]
        print(f"    runtime failure: {msg}", flush=True)
        return {"tag": tag, "opts": opts, "status": "failed", "error": msg}
    rate = batch / ms * 1e3 if ms == ms and ms > 0 else 0.0
    print(f"    {ms:.2f} ms/iter = {rate:.0f} img/s", flush=True)
    return {"tag": tag, "opts": opts, "status": "ok",
            "ms_per_iter": round(ms, 3), "img_per_s": round(rate, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", choices=["serving", "train", "both"],
                    default="serving")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--train-batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("--tags", default=None,
                    help="comma-separated subset of config tags to run "
                         "(applies to both graphs); default = all")
    args = ap.parse_args()

    if args.tags:
        keep = {t.strip() for t in args.tags.split(",")}
        SERVING_CONFIGS[:] = [c for c in SERVING_CONFIGS if c[0] in keep]
        TRAIN_CONFIGS[:] = [c for c in TRAIN_CONFIGS if c[0] in keep]

    from yolo_tpu.utils.platform import (
        machine_cache_dir,
        respect_jax_platforms_env,
    )

    respect_jax_platforms_env()
    import jax

    # Flag sweeps must NOT hit the persistent compile cache: a cached
    # executable from a different options set would alias the measurement.
    import atexit
    import shutil
    import tempfile

    cache_dir = tempfile.mkdtemp(prefix="jax_cache_flag_sweep_")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    atexit.register(shutil.rmtree, cache_dir, ignore_errors=True)
    del machine_cache_dir  # documented: deliberately unused here

    results = {}
    if args.graph in ("serving", "both"):
        results["serving"] = sweep_serving(args.batch, args.iters)
    if args.graph in ("train", "both"):
        results["train"] = sweep_train(args.train_batch, args.iters)

    print(json.dumps(results))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
