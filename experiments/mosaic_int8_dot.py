#!/usr/bin/env python
"""Mosaic (Pallas-TPU) int8 dot throughput at candidate kernel geometries.

Decides whether hand-written stem / transition-conv kernels can beat XLA's
int8 convs: XLA's conv path reaches ~219 TOPS effective on 64-plane shapes
and ~114 TOPS on the stem (profiled, tools/profile_layers.py --int8); a
Pallas kernel only wins if Mosaic's int8 dot sustains comparable rates at
the geometry the kernel needs:

  stem (col/row-pair phases):      (M, 300) @ (300, 256)
  stem (naive im2col):             (M, 192) @ (192, 64)
  layer2 transition conv2 im2col:  (M, 1152) @ (1152, 128)
  reference full-fill:             (M, 512) @ (512, 512)
  layer1 identity conv geometry:   (M, 256) @ (256, 64)

Each case streams M rows through a grid of row-chunks; per step one dot
A[BM,K] @ W[K,N] -> s32, requantized to s8 (the epilogue every real kernel
pays) and written out. Reported TOPS = 2*M*K*N / time.

Usage: python experiments/mosaic_int8_dot.py [--bm 1024] [--m 1048576]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1 << 20)
    ap.add_argument("--bm", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from yolo_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from yolo_tpu.utils.platform import machine_cache_dir
    from yolo_tpu.utils.timing import device_time_ms

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )

    def kernel(a_ref, w_ref, m_ref, out_ref):
        acc = jax.lax.dot_general(
            a_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * m_ref[...]
        out_ref[...] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnames=("bm",))
    def run(a, w, m, bm):
        M, K = a.shape
        N = w.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(M // bm,),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        )(a, w, m)

    cases = [
        ("stem-phase  K=300  N=256", 300, 256),
        ("stem-naive  K=192  N=64 ", 192, 64),
        ("l2-im2col   K=1152 N=128", 1152, 128),
        ("full-fill   K=512  N=512", 512, 512),
        ("l1-conv1    K=256  N=64 ", 256, 64),
    ]
    key = jax.random.PRNGKey(0)
    M = args.m
    print(f"M={M} bm={args.bm} (int8 x int8 -> s32 dot + requant epilogue)")
    for name, K, N in cases:
        a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        w = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        m = jnp.full((1, N), 1e-3, jnp.float32)
        t = device_time_ms(lambda a_: run(a_, w, m, args.bm), a,
                           iters=args.iters, tag=name[:10])
        tops = 2 * M * K * N / (t / 1e3) / 1e12
        gb = (M * K + M * N) / 1e9
        print(f"  {name}  {t:7.3f} ms  {tops:6.1f} TOPS  "
              f"(streams {gb:.2f} GB -> {gb / (t / 1e3):.0f} GB/s)")


if __name__ == "__main__":
    main()
