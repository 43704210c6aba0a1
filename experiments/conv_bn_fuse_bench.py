#!/usr/bin/env python
"""Conv+BN-stats fusion microbench: can a Mosaic kernel beat XLA's train BN?

VERDICT item 2 (round 4): round 3 measured that fusing train-mode BN
*around* the conv loses (ops/fused_bn.py — XLA computes the batch-stat
reductions as near-free read fusions of conv passes it already makes); the
open question was fusing the stats *into* the conv kernel itself, at the
layer3/4 identity-conv2 geometries where Mosaic dots demonstrated 283+ TOPS
(experiments/mosaic_int8_dot.py). This benchmark settles it on-device:

  xla_conv       lax.conv alone (the bound any kernel must match first)
  xla_conv_bn    conv -> batch mean/var -> scale/shift + ReLU, returning
                 (out, mean, var) — the train-mode forward BN chain XLA
                 actually compiles (flax BatchNorm use_running_average=False)
  pallas_conv    Mosaic 3x3 SAME conv: 9 taps x 2 column parities = 18
                 full-fill (M, C)@(C, K) bf16 dots from free row/lane-slice
                 views of a VMEM-padded block (no halo DMA, no im2col
                 scratch), f32 accumulators
  pallas_conv_stats  same kernel also accumulating per-channel sum/sum-sq
                 across the sequential grid (the "BN stats for free" claim),
                 then the same XLA normalize+ReLU epilogue from those sums

If pallas_conv alone is slower than xla_conv by more than xla_conv_bn's
stats overhead, the in-kernel fusion cannot win regardless of how well the
stats hide — the decisive measurement. Reference train path this would
accelerate: /root/reference/src/yolo/training/trainer.py:69-95.

Usage: python experiments/conv_bn_fuse_bench.py [--batch 128] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build(H: int, C: int, K: int, batch: int, img_chunk: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(x_ref, w_ref, y_ref, s_ref, xp_ref, *, IMG, stats):
        WP = H + 2
        Wh = H // 2
        M = IMG * H * Wh
        zrow = jnp.zeros((IMG, WP, C), jnp.bfloat16)
        zcol = jnp.zeros((IMG, H, C), jnp.bfloat16)
        xp_ref[:, 0, :, :] = zrow
        xp_ref[:, H + 1, :, :] = zrow
        xp_ref[:, 1 : H + 1, 0, :] = zcol
        xp_ref[:, 1 : H + 1, H + 1, :] = zcol
        xp_ref[:, 1 : H + 1, 1 : H + 1, :] = x_ref[:, :, :, :]
        # Column-parity view: (WP, C) -> (WP/2, 2C), so a +-1 column shift
        # becomes a row offset + lane-half choice (free views; the wino
        # kernel's trick, serving/pallas_wino.py).
        xpv = xp_ref[:, :, :, :].reshape(IMG, WP, WP // 2, 2 * C)
        acc = [None, None]
        for dh in range(3):
            for dw in range(3):
                wt = w_ref[dh * 3 + dw, :, :]
                for p in range(2):
                    o = p + dw  # padded col = 2j + o
                    opnd = xpv[
                        :, dh : dh + H, o // 2 : o // 2 + Wh,
                        (o % 2) * C : (o % 2 + 1) * C,
                    ].reshape(M, C)
                    d = jax.lax.dot_general(
                        opnd, wt, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc[p] = d if acc[p] is None else acc[p] + d
        for p in range(2):
            y_ref[:, :, :, p * K : (p + 1) * K] = (
                acc[p].astype(jnp.bfloat16).reshape(IMG, H, Wh, K)
            )
        if stats:
            s0 = jnp.sum(acc[0], axis=0) + jnp.sum(acc[1], axis=0)
            s1 = jnp.sum(acc[0] * acc[0], axis=0) + jnp.sum(
                acc[1] * acc[1], axis=0
            )
            part = jnp.stack([s0, s1])

            @pl.when(pl.program_id(0) == 0)
            def _init():
                s_ref[:, :] = part

            @pl.when(pl.program_id(0) != 0)
            def _accum():
                s_ref[:, :] = s_ref[:, :] + part

    def pallas_conv(x, w9, stats: bool):
        n = x.shape[0]
        Wh = H // 2
        y, s = pl.pallas_call(
            functools.partial(_kernel, IMG=img_chunk, stats=stats),
            grid=(n // img_chunk,),
            in_specs=[
                pl.BlockSpec((img_chunk, H, H, C), lambda g: (g, 0, 0, 0)),
                pl.BlockSpec((9, C, K), lambda g: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(
                    (img_chunk, H, Wh, 2 * K), lambda g: (g, 0, 0, 0)
                ),
                pl.BlockSpec((2, K), lambda g: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, H, Wh, 2 * K), jnp.bfloat16),
                jax.ShapeDtypeStruct((2, K), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((img_chunk, H + 2, H + 2, C), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(x, w9)
        return y.reshape(n, H, H, K), s

    return pallas_conv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--interpret", action="store_true")
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
    from yolo_tpu.utils.timing import device_time_ms

    eps = 1e-5
    # (H, C, K, img_chunk): layer3 / layer4 identity conv2 geometries @448².
    for name, H, C, K, chunk in (
        ("layer3_conv2", 28, 256, 256, 4),
        ("layer4_conv2", 14, 512, 512, 8),
    ):
        n = args.batch
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, H, H, C), jnp.bfloat16)
        w = (
            jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, K), jnp.bfloat16)
            * float(1.0 / np.sqrt(9 * C))
        ).astype(jnp.bfloat16)
        w9 = w.reshape(9, C, K)
        gamma = jnp.ones((K,), jnp.float32)
        beta = jnp.zeros((K,), jnp.float32)
        M_total = n * H * H

        @jax.jit
        def xla_conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        @jax.jit
        def xla_conv_bn(x, w, gamma, beta):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(y), axis=(0, 1, 2)) - jnp.square(mean)
            out = (y - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
            return jnp.maximum(out, 0.0).astype(jnp.bfloat16), mean, var

        pallas_conv = build(H, C, K, n, chunk, args.interpret)

        @jax.jit
        def pallas_only(x, w9):
            y, _ = pallas_conv(x, w9, stats=False)
            return y

        @jax.jit
        def pallas_conv_stats(x, w9, gamma, beta):
            y, s = pallas_conv(x, w9, stats=True)
            mean = s[0] / M_total
            var = s[1] / M_total - jnp.square(mean)
            out = (
                (y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
                * gamma + beta
            )
            return jnp.maximum(out, 0.0).astype(jnp.bfloat16), mean, var

        # ---- numerics ----------------------------------------------------
        y_ref = xla_conv(x, w)
        y_pal = pallas_only(x, w9)
        conv_err = float(
            jnp.max(jnp.abs(y_ref.astype(jnp.float32) - y_pal.astype(jnp.float32)))
        )
        out_ref = xla_conv_bn(x, w, gamma, beta)
        out_pal = pallas_conv_stats(x, w9, gamma, beta)
        bn_err = float(
            jnp.max(jnp.abs(out_ref[0].astype(jnp.float32)
                            - out_pal[0].astype(jnp.float32)))
        )
        mean_err = float(jnp.max(jnp.abs(out_ref[1] - out_pal[1])))

        flops = M_total * 9 * C * K * 2
        rows = [
            ("xla_conv", device_time_ms(xla_conv, x, w, iters=args.iters,
                                        tag=f"xc_{name}")),
            ("xla_conv_bn", device_time_ms(xla_conv_bn, x, w, gamma, beta,
                                           iters=args.iters, tag=f"xb_{name}")),
            ("pallas_conv", device_time_ms(pallas_only, x, w9,
                                           iters=args.iters, tag=f"pc_{name}")),
            ("pallas_conv_stats", device_time_ms(
                pallas_conv_stats, x, w9, gamma, beta, iters=args.iters,
                tag=f"ps_{name}")),
        ]
        print(f"\n{name}: b{n} {H}x{H} {C}->{K} bf16 "
              f"({flops / 1e9:.1f} GFLOP/step)  "
              f"conv |d|max {conv_err:.4f}, bn out |d|max {bn_err:.4f}, "
              f"mean |d|max {mean_err:.5f}")
        for label, ms in rows:
            tfs = flops / (ms * 1e-3) / 1e12 if ms > 0 else float("nan")
            print(f"  {label:20s} {ms:8.3f} ms   {tfs:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
