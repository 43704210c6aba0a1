#!/usr/bin/env python
"""Probe: XLA int8 transition-conv geometries (strided vs superpixel-packed).

The engine's stride-2 transition conv2s run 2.5-3.5x over their compute
floors (tools/profile_layers.py: layer2 2.23 ms vs ~0.6, layer3 1.32 vs
~0.6 @b256) — XLA's strided-int8-conv weakness, and the Mosaic dense-dot
kernel lost too (PARITY.md). This probe asks whether re-expressing the
stride as channel packing helps *within XLA*:

  (a) baseline      3x3 stride (2,2) pad 1 on (N, H, H, C)
  (b) col-packed    bitcast (N, H, H/2, 2C) [FREE: row-major identity],
                    kernel (3, 2) strides (2, 1); dx taps become weight
                    layout with 2C input channels (25% zero-weight waste,
                    bit-exact integer accumulation)
  (c) full-packed   (N, H/2, H/2, 4C) 2x2 stride 1 — the no-stride ideal;
                    NOTE the row packing is a real relayout (~1 ms at
                    layer2 scale), timed here WITHOUT that cost to bound
                    the best case.

Usage: python experiments/t2_conv_geometry.py [--batch 256]

RESULT (v5e-1, b256, round 3): re-expression inside XLA does NOT fix the
strided shape class.
    l2 (112^2, C=128):  (a) 2.558 ms  (b) 2.815  (c) 2.891
    l3 (56^2,  C=256):  (a) 1.438 ms  (b) 1.852  (c) 1.091
l2 — the biggest strided residual — is fastest in the plain strided form;
both packings lose. l3's full-packed win (0.35 ms) is smaller than the real
row-relayout it needs (~0.5 ms of int8 traffic at that scale, and the s2d
permutation cannot ride a dot epilogue), so it nets negative too. Together
with the Pallas dense-dot kernel's e2e loss (PARITY.md), the transition
slack is confirmed compiler-bound from every direction tried.
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from yolo_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from yolo_tpu.utils.platform import machine_cache_dir
    from yolo_tpu.utils.timing import device_time_ms

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )

    def conv(x, w, strides, pad):
        return lax.conv_general_dilated(
            x, w, strides, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    @functools.partial(jax.jit, static_argnames=("shape",))
    def ri8(key, shape):
        return jax.random.randint(key, shape, -127, 128, jnp.int8)

    n = args.batch
    key = jax.random.PRNGKey(0)
    for tag, H, C in [("l2", 112, 128), ("l3", 56, 256)]:
        x = jax.block_until_ready(ri8(key, (n, H, H, C)))
        w33 = jax.block_until_ready(ri8(key, (3, 3, C, C)))
        f_a = jax.jit(lambda x, w: conv(x, w, (2, 2), [(1, 1), (1, 1)]))
        t_a = device_time_ms(f_a, x, w33, tag=f"{tag}a")
        print(f"{tag}: (a) strided 3x3          {t_a:7.3f} ms", flush=True)

        xp = x.reshape(n, H, H // 2, 2 * C)
        w32 = jax.block_until_ready(ri8(key, (3, 2, 2 * C, C)))
        f_b = jax.jit(lambda x, w: conv(x, w, (2, 1), [(1, 1), (1, 0)]))
        t_b = device_time_ms(f_b, xp, w32, tag=f"{tag}b")
        print(f"{tag}: (b) col-packed (3,2)s21  {t_b:7.3f} ms", flush=True)

        xq = jax.block_until_ready(
            jax.jit(
                lambda x: jnp.transpose(
                    x.reshape(n, H // 2, 2, H // 2, 2, C), (0, 1, 3, 2, 4, 5)
                ).reshape(n, H // 2, H // 2, 4 * C)
            )(x)
        )
        w22 = jax.block_until_ready(ri8(key, (2, 2, 4 * C, C)))
        f_c = jax.jit(lambda x, w: conv(x, w, (1, 1), [(1, 0), (1, 0)]))
        t_c = device_time_ms(f_c, xq, w22, tag=f"{tag}c")
        print(f"{tag}: (c) full-packed 2x2 s1   {t_c:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
