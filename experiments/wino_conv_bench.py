#!/usr/bin/env python
"""On-device timing: Pallas Winograd F(2,3) vs direct int8 conv vs XLA wino.

Geometries = the compute-bound 3x3/s1 convs of the int8 serving graph @448²
(PARITY.md ledger): head conv1 (b, 14, 14, 1024 -> 1024, 5.25 ms direct at
its 394-TOPS int8 compute bound), layer3 identity conv2 (28², 256),
layer4 identity conv2 (14², 512). Winograd cuts MACs 2.25x, so the floor
drops to ~2.3 ms for head conv1 IF the fused kernel holds tap-dot rate
(339-352 TOPS measured for the batched 16-tap dots alone).

Usage: python experiments/wino_conv_bench.py [--batch 256] [--chunks 2,4,8]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chunks", default="2,4,8")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cases", default="head1,l3c2,l4c2")
    ap.add_argument("--xla-wino", action="store_true")
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

    from yolo_tpu.serving import winograd as W
    from yolo_tpu.serving.engine import _conv_i8, _requant
    from yolo_tpu.serving.pallas_wino import conv3x3_wino_pallas
    from yolo_tpu.serving.quant import _layer
    from yolo_tpu.utils.timing import device_time_ms

    GEOS = {
        "head1": (14, 1024, 1024, True),
        "l3c2": (28, 256, 256, False),
        "l4c2": (14, 512, 512, False),
    }
    rng = np.random.default_rng(0)
    n = args.batch
    for case in args.cases.split(","):
        h, c, k, leaky = GEOS[case]
        s_in, s_out = 0.05, 0.08
        x_q = jnp.asarray(rng.integers(-127, 128, (n, h, h, c)), jnp.int8)
        w = jnp.asarray(rng.normal(size=(3, 3, c, k)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.normal(size=(k,)) * 0.5, jnp.float32)
        qc = dict(_layer(w, b, s_in, s_out))
        x_f = x_q.astype(jnp.float32) * s_in
        qc["wino"] = W.wino_quantize(w, b, s_in, s_out, W.tap_maxima(x_f))
        macs = 2 * n * h * h * 9 * c * k

        def direct(x):
            return _requant(_conv_i8(x, qc["wq"], 1, 1), qc["m"], qc["t"],
                            leaky=leaky)

        t = device_time_ms(jax.jit(direct), x_q, iters=args.iters,
                           tag=f"{case}_direct")
        print(f"{case}: direct      {t:7.3f} ms  "
              f"({macs / t / 1e9:6.1f} TOPS)", flush=True)

        if args.xla_wino:
            fn = jax.jit(lambda x: W.conv3x3_wino_rq(x, qc, leaky=leaky))
            t = device_time_ms(fn, x_q, iters=args.iters, tag=f"{case}_xlaw")
            print(f"{case}: xla-wino    {t:7.3f} ms", flush=True)

        y_ref = np.asarray(direct(x_q), np.int32)
        for ch in (int(s) for s in args.chunks.split(",")):
            try:
                fn = jax.jit(
                    lambda x, ch=ch: conv3x3_wino_pallas(
                        x, qc, leaky=leaky, img_chunk=ch
                    )
                )
                t = device_time_ms(fn, x_q, iters=args.iters,
                                   tag=f"{case}_pl{ch}")
                d = np.abs(np.asarray(fn(x_q), np.int32) - y_ref)
                print(f"{case}: pallas c={ch:<2d} {t:7.3f} ms  "
                      f"(wino-TOPS {macs / 2.25 / t / 1e9:6.1f}, "
                      f"max|d|={d.max()}, frac>1 LSB="
                      f"{(d > 1).mean():.4f})", flush=True)
            except Exception as e:  # noqa: BLE001 — report and move on
                msg = str(e).splitlines()[0][:160]
                print(f"{case}: pallas c={ch} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
