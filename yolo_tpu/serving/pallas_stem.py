"""Pallas TPU kernel: fused input-quantize + space-to-depth stem front.

The int8 engine's stem front (engine.int8_forward) quantizes the normalized
image and rearranges it space-to-depth for the 4x4/s1 stem conv. XLA compiles
that to a quantize loop-fusion PLUS two relayout copies (profiled @b256/448²:
0.68 ms quant + 1.76 ms of pure copies) because the quantize fusion writes
the image's entry layout while the conv wants the shuffled s2d layout.

This kernel emits the conv's preferred physical layout directly. Both the
image parameter and the stem-conv input are batch-in-lanes on v5e
(``bf16[N,H,W,3]{0,2,3,1}`` / ``s8[N,H/2,W/2,12]{0,2,3,1}`` — minor->major
N, W, C, H), so over LOGICAL shapes ``(H, C, W, N)`` -> ``(H/2, 12, W/2, N)``
both sides are plain row-major and the engine-side transposes are free
bitcasts. In-kernel, the W-deinterleave avoids strided slicing (unsupported
in Mosaic) via the row-major identity ``(C, W, N) == (C, W/2, 2N)``: column
parity becomes a LANE slice at an N-multiple boundary.

Quantization math is ``clip(round(x / s_img))`` in f32 — bit-identical to
engine._quantize_input, pinned by tests/test_serving.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_s2d_kernel(s_ref, x_ref, out_ref, *, R: int, C: int, W: int,
                      N: int):
    """One grid step: 2R input rows (2R, C, W, N) -> R output rows
    (R, 4C, W/2, N)."""
    s = s_ref[0]
    for r in range(R):
        for p in range(2):
            x = x_ref[2 * r + p].astype(jnp.float32) / s
            q = jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)
            # (C, W, N) -> (C, W/2, 2N): row-major view; column parity q
            # lands in lane halves.
            qr = q.reshape(C, W // 2, 2 * N)
            for qq in range(2):
                ch = (p * 2 + qq) * C
                out_ref[r, ch : ch + C, :, :] = qr[:, :, qq * N : (qq + 1) * N]


@functools.partial(jax.jit, static_argnames=("rows_per_step", "interpret"))
def quant_s2d_int8(images, s_img, rows_per_step: int = 4,
                   interpret: bool = False):
    """(N, H, W, C) float images -> (N, H/2, W/2, 4C) int8, s2d-arranged.

    Output element [n, I, J, (p*2+q)*C + c] == quant(images[n, 2I+p, 2J+q, c])
    — exactly engine.int8_forward's quantize + space-to-depth, one pass.
    """
    n, h, w, c = images.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    xt = jnp.transpose(images, (1, 3, 2, 0))  # (H, C, W, N): physical no-op
    R = rows_per_step
    while (h // 2) % R:
        R //= 2
    out = pl.pallas_call(
        functools.partial(_quant_s2d_kernel, R=R, C=c, W=w, N=n),
        grid=(h // 2 // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * R, c, w, n), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, 4 * c, w // 2, n), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h // 2, 4 * c, w // 2, n), jnp.int8),
        # 2R input rows (bf16) + R output rows double-buffered exceed the
        # default 16 MB scoped-vmem cap at 448²/b256 (17 MB); v5e VMEM is
        # far larger (see pallas_int8.fused_identity_chain_int8).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(s_img.reshape(1).astype(jnp.float32), xt)
    return jnp.transpose(out, (3, 0, 2, 1))  # (N, H/2, W/2, 4C): physical no-op


def stem_front_pallas(images, s_img, interpret: bool = False):
    """engine.int8_forward ``impl["stem_front"]`` adapter."""
    return quant_s2d_int8(images, s_img, interpret=interpret)
