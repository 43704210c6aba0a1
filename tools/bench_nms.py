#!/usr/bin/env python
"""Settle the Pallas-vs-XLA NMS question with on-chip numbers (VERDICT #6).

Times both NMS implementations in two settings at the headline batch:
  standalone — decode output -> NMS only (isolates the kernels), and
  in-graph   — the full forward+decode+NMS serving graph with each impl
               (what the default actually affects).

Usage: python tools/bench_nms.py [--batch 512]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--standalone-only", action="store_true")
    args = ap.parse_args()

    from yolo_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()

    import jax
    import jax.numpy as jnp

    from yolo_tpu.utils.platform import machine_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )

    from yolo_tpu.ops.decode import decode_predictions
    from yolo_tpu.ops.nms import batched_nms
    from yolo_tpu.ops.pallas_nms import pallas_nms
    from yolo_tpu.utils.timing import device_time_ms

    b = args.batch
    # Realistic decode output: random grids through the real decoder.
    grids = jax.random.normal(jax.random.PRNGKey(0), (b, 7, 7, 30)) * 0.5
    dets = jax.jit(
        lambda g: decode_predictions(g, 7, 2, 20, 0.0)
    )(grids)
    jax.block_until_ready(dets)

    t_xla = device_time_ms(
        jax.jit(lambda d: batched_nms(d, 0.4)), dets,
        iters=args.iters, tag="nms_xla",
    )
    t_pl = device_time_ms(
        jax.jit(lambda d: pallas_nms(d, 0.4)), dets,
        iters=args.iters, tag="nms_pallas",
    )
    print(f"standalone NMS @b{b}: xla {t_xla:.3f} ms | pallas {t_pl:.3f} ms"
          f" | pallas/xla {t_pl / t_xla:.2f}x")

    if args.standalone_only:
        return

    from yolo_tpu.inference import YOLOInference
    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model

    dtype = jnp.bfloat16
    model = YOLOv1(num_classes=20, S=7, B=2,
                   backbone=ResNetBackbone(dtype=dtype), dtype=dtype)
    variables = init_model(model, jax.random.PRNGKey(0))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 448, 448, 3), dtype)
    jax.block_until_ready(imgs)
    for impl in ("xla", "pallas"):
        engine = YOLOInference(model, variables, nms_impl=impl)
        t = device_time_ms(
            lambda im: engine.predict_batch_arrays(im, 0.25, 0.4), imgs,
            iters=4, tag=f"graph_{impl}",
        )
        print(f"full graph nms_impl={impl}: {t:.2f} ms "
              f"({b / t * 1000:.0f} img/s)")


if __name__ == "__main__":
    main()
