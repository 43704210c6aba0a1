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

uint8 wire format: raw resized RGB inputs additionally run the ImageNet
normalize fma in-kernel (same constants and op order as
data/transforms.py::device_normalize — ``u * scale_c + bias_c``, THEN the
``/ s_img`` quantize divide), so the serving input can ship 1 byte/pixel and
the kernel reads 154 MB instead of 308 MB bf16 @b256/448².
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_s2d_kernel(s_ref, x_ref, out_ref, *, R: int, C: int, W: int,
                      N: int, u8: bool):
    """One grid step: 2R input rows (2R, C, W, N) -> R output rows
    (R, 4C, W/2, N).

    ``s_ref`` is (1 + 2C,) f32 SMEM: [s_img, norm_scale[0:C], norm_bias[0:C]]
    (the norm tail is only read when ``u8``).
    """
    s = s_ref[0]
    for r in range(R):
        for p in range(2):
            if u8:
                # Raw uint8 RGB: ImageNet-normalize per channel first —
                # identical op order to device_normalize (mul, add), THEN
                # the quantize divide, matching the XLA uint8 path.
                raw = x_ref[2 * r + p].astype(jnp.float32)  # (C, W, N)
                # Bytes arrive bitcast as i8; recover u8 exactly in f32.
                raw = jnp.where(raw < 0, raw + 256.0, raw)
                x = jnp.stack(
                    [raw[c] * s_ref[1 + c] + s_ref[1 + C + c]
                     for c in range(C)]
                ) / s
            else:
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
    """(N, H, W, C) float OR raw uint8 images -> (N, H/2, W/2, 4C) int8, s2d.

    Output element [n, I, J, (p*2+q)*C + c] == quant(norm(images[n, 2I+p,
    2J+q, c])) — exactly engine.int8_forward's (normalize+)quantize +
    space-to-depth, one pass. ``norm`` applies only to uint8 inputs.
    """
    n, h, w, c = images.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    u8 = images.dtype == jnp.uint8
    if u8:
        from yolo_tpu.data.transforms import _NORM_BIAS, _NORM_SCALE

        scalars = jnp.concatenate([
            s_img.reshape(1).astype(jnp.float32),
            jnp.asarray(_NORM_SCALE[:c], jnp.float32),
            jnp.asarray(_NORM_BIAS[:c], jnp.float32),
        ])
        # Mosaic has no u8 vector loads on all jax versions; ship the bytes
        # as i8 (a free bitcast) and recover u8 semantics in f32 in-kernel.
        xin = jax.lax.bitcast_convert_type(images, jnp.int8)
    else:
        scalars = jnp.concatenate([
            s_img.reshape(1).astype(jnp.float32),
            jnp.zeros((2 * c,), jnp.float32),
        ])
        xin = images
    xt = jnp.transpose(xin, (1, 3, 2, 0))  # (H, C, W, N): physical no-op
    R = rows_per_step
    while (h // 2) % R:
        R //= 2
    out = pl.pallas_call(
        functools.partial(
            _quant_s2d_kernel, R=R, C=c, W=w, N=n, u8=u8
        ),
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
    )(scalars, xt)
    return jnp.transpose(out, (3, 0, 2, 1))  # (N, H/2, W/2, 4C): physical no-op


def stem_front_pallas(images, s_img, interpret: bool = False):
    """engine.int8_forward ``impl["stem_front"]`` adapter."""
    return quant_s2d_int8(images, s_img, interpret=interpret)
