"""EXPERIMENT: per-shape int8 vs bf16 conv timings on the real chip.

Decides the implementation strategy for the int8-resident serving pipeline
(PARITY.md "Known gaps", VERDICT next-round #1): for each hot shape from the
flagship profile (tools/profile_layers.py), measure
  a) XLA bf16 conv (the current production path),
  b) XLA int8 conv (int8 x int8 -> int32, scale epilogue),
  c) where relevant, int8 convs-as-dots variants.

Run: python experiments/int8_microbench.py [--batch 512]
    (or --only TAG, one process per case: the tunnel backend reclaims dropped
    buffers lazily, so back-to-back large cases in one process can OOM)

MEASURED (v5e-1, b512-equivalent, 2026-08-16, standalone ops — in-model
numbers differ by layout but ratios hold):

    shape                         bf16   int8conv  ratio
    stem_448_7x7s2_3->64         14.55     16.06   0.91   <- int8 LOSES on C=3
    l1_112_1x1_256->64            7.68      5.13   1.50
    l1_112_3x3_64->64             5.17      4.87   1.06   <- 64-lane waste
    l2_56_3x3_128->128            6.30      5.22   1.21
    l2_56_1x1_128->512           15.13     11.12   1.36
    l3_28_3x3_256->256            3.37      2.10   1.61
    l3_28_1x1_256->1024           5.22      4.15   1.26
    l4_14_3x3_512->512            2.89      1.65   1.75
    head_14_3x3_2048->1024       20.43     11.21   1.82

Conclusion (revises round-1 PARITY.md "XLA int8 conv is slower than bf16"):
with activations already int8 (int8-resident, no per-layer q/dq) XLA's int8
convs beat bf16 at every shape with C >= 64, approaching 2x where compute-
bound. The C=3 stem and the HBM-bound 112^2 stage need custom handling
(serving/pallas_int8.py fused bottleneck; space-to-depth stem).
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_yolo_tpu")

from yolo_tpu.utils.timing import device_time_ms  # noqa: E402


@functools.partial(jax.jit, static_argnames=("stride", "pad"))
def conv_bf16(x, w, b, stride=1, pad=1):
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(y + b).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("stride", "pad"))
def conv_int8(x_q, w_q, b, scale, stride=1, pad=1):
    """int8 conv -> int32, dequant + relu + requant to int8 epilogue."""
    y = lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = jax.nn.relu(y.astype(jnp.float32) * scale + b)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


@jax.jit
def head_conv1_int8_dots(x_q, w_q, b, scale):
    """3x3 2048->1024 @14^2 as 9 shifted int8 dots (padded 16x16 spatial)."""
    n = x_q.shape[0]
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (n,16,16,2048)
    xf = xp.reshape(n * 256, 2048)
    acc = jnp.zeros((n, 16, 16, w_q.shape[-1]), jnp.int32)
    # y[i,j] = sum_taps x[i+dy, j+dx] @ w[dy,dx]; accumulate shifted outputs.
    for dy in range(3):
        for dx in range(3):
            r = lax.dot_general(
                xf, w_q[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(n, 16, 16, -1)
            acc = acc + jnp.roll(r, (1 - dy, 1 - dx), axis=(1, 2))
    y = acc[:, 1:15, 1:15, :]
    y = jax.nn.relu(y.astype(jnp.float32) * scale + b)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def rnd_int8(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--only", default=None,
                    help="run a single case (shape tag, 'head_dots', or "
                         "'raw_dot') — one process per case avoids the "
                         "tunnel server's lazy memory reclaim")
    args = ap.parse_args()
    b = args.batch
    k = jax.random.PRNGKey(0)

    # (tag, H, Cin, Cout, ksize, stride, batch) — stem at b/4 (the padded
    # C=3 448^2 buffers don't fit alongside their int8 twins at b512).
    shapes = [
        ("stem_448_7x7s2_3->64", 448, 3, 64, 7, 2),
        ("l1_112_1x1_256->64", 112, 256, 64, 1, 1),
        ("l1_112_3x3_64->64", 112, 64, 64, 3, 1),
        ("l1_112_1x1_64->256", 112, 64, 256, 1, 1),
        ("l2_56_3x3_128->128", 56, 128, 128, 3, 1),
        ("l2_56_1x1_128->512", 56, 128, 512, 1, 1),
        ("l3_28_3x3_256->256", 28, 256, 256, 3, 1),
        ("l3_28_1x1_256->1024", 28, 256, 1024, 1, 1),
        ("l4_14_3x3_512->512", 14, 512, 512, 3, 1),
        ("head_14_3x3_2048->1024", 14, 2048, 1024, 3, 1),
        ("head_7_3x3_1024->1024", 7, 1024, 1024, 3, 1),
    ]
    if args.only is None:
        print(f"batch={b}; all times device ms/iter")
        print(f"{'shape':<28} {'bf16':>8} {'int8conv':>9} {'ratio':>6}")
    for tag, H, Cin, Cout, ks, st in shapes:
        if args.only and args.only != tag:
            continue
        bb = b // 4 if H >= 448 else b
        pad = (ks - 1) // 2 if ks > 1 else 0
        if ks == 7:
            pad = 3
        try:
            x = jax.random.normal(k, (bb, H, H, Cin), jnp.bfloat16)
            w = jax.random.normal(k, (ks, ks, Cin, Cout), jnp.bfloat16) * 0.05
            bias = jnp.zeros((Cout,), jnp.float32)
            t_bf16 = device_time_ms(
                functools.partial(conv_bf16, stride=st, pad=pad), x, w, bias,
                tag=tag + "_bf16", iters=3,
            ) * (b / bb)
            x.delete()
            xq = rnd_int8(k, (bb, H, H, Cin))
            wq = rnd_int8(k, (ks, ks, Cin, Cout))
            scale = jnp.float32(1e-4)
            t_int8 = device_time_ms(
                functools.partial(conv_int8, stride=st, pad=pad), xq, wq,
                bias, scale, tag=tag + "_int8", iters=3,
            ) * (b / bb)
            xq.delete()
        except Exception as exc:
            print(f"{tag:<28} FAILED: {type(exc).__name__}")
            continue
        print(f"{tag:<28} {t_bf16:>8.2f} {t_int8:>9.2f} {t_bf16 / t_int8:>6.2f}")

    # Head conv1 as 9 shifted int8 dots.
    if args.only and args.only != "head_dots":
        if args.only != "raw_dot":
            return
        xq = None
    else:
        xq = rnd_int8(k, (b, 14, 14, 2048))
    if xq is not None:
        wq = rnd_int8(k, (3, 3, 2048, 1024))
        bias = jnp.zeros((1024,), jnp.float32)
        t = device_time_ms(head_conv1_int8_dots, xq, wq, bias,
                           jnp.float32(1e-4), tag="head_dots")
        print(f"{'head_14_int8_9dots':<28} {'-':>8} {t:>9.2f}")
    if args.only and args.only != "raw_dot":
        return

    # Raw MXU sanity: big int8 dot vs bf16 dot.
    M, K, N = 131072, 2048, 1024
    a8, b8 = rnd_int8(k, (M, K)), rnd_int8(k, (K, N))
    dot8 = jax.jit(lambda a, c: lax.dot_general(
        a, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    t8 = device_time_ms(dot8, a8, b8, tag="dot8")
    abf = jax.random.normal(k, (M, K), jnp.bfloat16)
    bbf = jax.random.normal(k, (K, N), jnp.bfloat16)
    dotb = jax.jit(lambda a, c: lax.dot_general(
        a, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    tb = device_time_ms(dotb, abf, bbf, tag="dotbf16")
    flops = 2 * M * K * N
    print(f"raw dot {M}x{K}x{N}: bf16 {tb:.2f} ms ({flops / tb / 1e9:.0f} GF/s)"
          f" | int8 {t8:.2f} ms ({flops / t8 / 1e9:.0f} GOP/s)")


if __name__ == "__main__":
    main()
