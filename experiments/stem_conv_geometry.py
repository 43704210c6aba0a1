#!/usr/bin/env python
"""Probe: XLA int8 STEM-conv geometries (s2d granularity / channel padding).

The engine's stem conv (7x7/s2 re-expressed as s2d(2) + 4x4/s1 over
(N, 224, 224, 12) -> (N, 224, 224, 64)) runs ~2.8 ms @b256 = 113 TOPS,
2.3x over its 1.2 ms compute floor (tools/profile_layers.py --int8). Two
geometry suspects: K = 4*4*12 = 192 (1.5 MXU tiles) and C_out = 64 (half a
tile). The Pallas stem front (serving/pallas_stem.py) OWNS the input layout,
so any s2d granularity or zero-padded channel count is free to feed — this
probe times the conv alternatives alone:

  (a) baseline   4x4 s1, 12 -> 64 @ 224^2 (what ships today)
  (b) K-pad      4x4 s1, 16 -> 64 (C_in zero-padded: K = 256, one extra
                 all-zero input plane per s2d phase — bit-exact)
  (c) N-probe    4x4 s1, 12 -> 128 (diagnostic: is C_out=64 the limiter?)
  (d) both       4x4 s1, 16 -> 128 (diagnostic)
  (e) H4W4       3x3 s1, 48 -> 256 @ 112^2 — input s2d(4), output in
                 H2W2-superpixel form (each output pixel = a 2x2 quad of
                 stem outputs x 64 ch). Dense-K inflation 2.94x but the
                 known-fast 3x3 >=128-channel conv class; the maxpool
                 after it must then read superpixel-packed data.
  (f) H2W4       4x3 s1, 24 -> 128 @ (224, 112) — input s2d rows-2/cols-4,
                 output W2-packed (pairs of output cols in channels).
                 Inflation 1.96x.

Every variant carries the engine's requant epilogue (fma + relu + round/clip
to int8) so the timed op matches the in-graph fusion form (s8 output); a bare
conv would write the 3-6 GB i32 accumulator to HBM and drown the comparison.

Usage: python experiments/stem_conv_geometry.py [--batch 256]

RESULT (v5e-1, b256, round 4): every reformulation LOSES; the shipped form
(a) is the fastest XLA expression of the stem conv.
    (a) 4x4 12->64            2.819 ms   (matches the in-graph 2.8)
    (b) 4x4 16->64  K-pad     2.768 ms   (K alignment is NOT the limiter)
    (c) 4x4 12->128          11.349 ms   (wider C_out makes it far WORSE)
    (d) 4x4 16->128          11.327 ms
    (e) 3x3 48->256 @112^2    6.294 ms   (112.9 dense TOPS — the "fast 3x3
                                          class" does not materialize at
                                          C_in=48; superpixel output dead)
    (f) 4x3 24->128           7.288 ms
XLA's int8 conv emitter is limited by small C_in at large spatial extent,
not by K alignment or C_out fill; no s2d granularity fixes it. Together
with the Mosaic N=64 dot rates (experiments/mosaic_int8_dot.py: 12-31
TOPS), the stem conv's 1.6 ms over its compute floor is compiler-bound
from every direction now probed.
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# True useful work of the stem @448^2: 224^2 * 64 * (7*7*3) MACs / image.
TRUE_GOP_PER_IMG = 224 * 224 * 64 * 147 * 2 / 1e9


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
    cases = [
        # tag, in (H, W, C), kernel (kh, kw, Cin, Cout), pad
        ("a 4x4 12->64  @224^2 ", (224, 224, 12), (4, 4, 12, 64),
         [(2, 1), (2, 1)]),
        ("b 4x4 16->64  @224^2 ", (224, 224, 16), (4, 4, 16, 64),
         [(2, 1), (2, 1)]),
        ("c 4x4 12->128 @224^2 ", (224, 224, 12), (4, 4, 12, 128),
         [(2, 1), (2, 1)]),
        ("d 4x4 16->128 @224^2 ", (224, 224, 16), (4, 4, 16, 128),
         [(2, 1), (2, 1)]),
        ("e 3x3 48->256 @112^2 ", (112, 112, 48), (3, 3, 48, 256),
         [(1, 1), (1, 1)]),
        ("f 4x3 24->128 @224x112", (224, 112, 24), (4, 3, 24, 128),
         [(2, 1), (1, 1)]),
    ]
    gop = TRUE_GOP_PER_IMG * n

    def conv_rq(x, w, m, t, pad):
        acc = conv(x, w, (1, 1), pad)
        y = jnp.maximum(acc.astype(jnp.float32) * m + t, 0.0)
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    for tag, (h, w, c), kshape, pad in cases:
        x = jax.block_until_ready(ri8(key, (n, h, w, c)))
        wq = jax.block_until_ready(ri8(key, kshape))
        m = jnp.full((kshape[-1],), 1e-3, jnp.float32)
        tv = jnp.zeros((kshape[-1],), jnp.float32)
        f = jax.jit(lambda x, w, m, tv, pad=pad: conv_rq(x, w, m, tv, pad))
        t = device_time_ms(f, x, wq, m, tv, tag=tag.split()[0])
        del x, wq
        kh, kw, ci, co = kshape
        dense_gop = n * h * w * kh * kw * ci * co * 2 / 1e9
        print(
            f"{tag}: {t:7.3f} ms  dense {dense_gop / t:6.1f} TOPS"
            f"  ({dense_gop / gop:.2f}x MACs, useful-rate"
            f" {gop / t:6.1f} TOPS-eq)",
            flush=True,
        )


if __name__ == "__main__":
    main()
