"""Pallas TPU kernel: int8-resident fused identity bottleneck.

One kernel per (image, row-tile) computes a full ResNet identity bottleneck

    out = q(relu(deq(conv3(y2)) + residual)),  y2 = q(relu(conv2(q(relu(conv1(x))))))

with every intermediate VMEM-resident and all three convs as int8 x int8 ->
int32 MXU dots. This is the memory-bound-stage workhorse of the serving
engine: at 112^2 the XLA path writes/reads y1/y2/out through HBM (~40 MB per
image per block at bf16) while this kernel moves only the int8 block input
(+2 halo rows) and output — an ~8x byte reduction vs bf16 XLA.

Implementation notes:
- The 3x3 conv runs as 9 shifted (rows*W, P) @ (P, P) tap dots accumulating
  in int32, over a zero-padded logical window (y1p) built with the clamped
  halo-DMA + 3-way shift trick from experiments/fused_block_pallas.py.
- Input row windows are DMA'd HBM->VMEM double-buffered across grid steps
  (global-step parity slots; the next window's copy is in flight during the
  current tile's compute — the experiment's measured flaw was serial DMA).
- W is padded to the int8 sublane multiple (112->128 etc.) inside the
  kernel's buffers so (rows, W, C) <-> (rows*W, C) reshapes stay
  relayout-free; the pad columns compute garbage that never leaves VMEM.
- Requant epilogues are per-channel f32 fma + round-half-even, matching
  serving/engine.py's XLA epilogues (tests/test_serving.py pins this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def default_tile_rows(H: int) -> int:
    """Largest divisor of H that is <= 32 and leaves TH + 2 <= H."""
    for th in range(min(32, H - 2), 0, -1):
        if H % th == 0:
            return th
    raise ValueError(f"no valid tile size for H={H}")


def _fused_identity_bottleneck_kernel(
    x_hbm, w1_ref, w2_ref, w3_ref, m1_ref, t1_ref, m2_ref, t2_ref,
    m3_ref, t3_ref, rx_ref,
    out_ref,
    xt, y1p, y1col, sem,
    *, TH: int, H: int, W: int, WP: int, C: int, P: int, N: int,
    padded: bool, im2col: bool,
):
    n = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    row0 = i * TH
    g = n * n_tiles + i  # global step; slot = g % 2

    def window_start(tile_idx):
        # Clamped fully-inside-image start of a (TH+2)-row halo window.
        return jnp.clip(tile_idx * TH - 1, 0, H - (TH + 2))

    def dma(step):
        img, tile = step // n_tiles, step % n_tiles
        # In padded mode x is physically (N, H, WP, C): full-width copies
        # (W-subslices require W % 8 == 0, which 28/14-wide stages fail).
        dst = xt.at[step % 2] if padded else xt.at[step % 2, :, :W, :]
        return pltpu.make_async_copy(
            x_hbm.at[img, pl.ds(window_start(tile), TH + 2), :, :],
            dst,
            sem.at[step % 2],
        )

    @pl.when(g == 0)
    def _():
        dma(0).start()

    @pl.when(g + 1 < N * n_tiles)
    def _():
        dma(g + 1).start()

    dma(g).wait()
    slot = g % 2

    # conv1 (1x1, C -> P) over all copied rows; requant to int8.
    xf = xt[slot].reshape((TH + 2) * WP, C)
    a1 = jax.lax.dot_general(
        xf, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y1f = a1.astype(jnp.float32) * m1_ref[...] + t1_ref[...]
    y1 = (
        jnp.clip(jnp.round(jnp.maximum(y1f, 0.0)), -127, 127)
        .astype(jnp.int8)
        .reshape(TH + 2, WP, P)
    )

    # Place copied rows into the logical halo window y1p (zeros off-image).
    # Copied row r holds logical window index r - d, d = row0 - 1 - start.
    y1p[...] = jnp.zeros_like(y1p)
    is_top = i == 0
    is_bot = i == n_tiles - 1

    @pl.when(is_top)
    def _():  # d = -1: window rows 1..TH+1 <- copied rows 0..TH
        y1p[pl.ds(1, TH + 1), pl.ds(1, W), :] = y1[0 : TH + 1, :W]

    @pl.when(is_bot & jnp.logical_not(is_top))
    def _():  # d = +1: window rows 0..TH <- copied rows 1..TH+1
        y1p[pl.ds(0, TH + 1), pl.ds(1, W), :] = y1[1 : TH + 2, :W]

    @pl.when(jnp.logical_not(is_top) & jnp.logical_not(is_bot))
    def _():  # d = 0: full window
        y1p[pl.ds(0, TH + 2), pl.ds(1, W), :] = y1[:, :W]

    # conv2 (3x3, P -> P): either 9 shifted tap dots with int32 VPU
    # accumulation, or an im2col patch matrix + ONE (rows, 9P) @ (9P, P) dot
    # (K=9P keeps the systolic array full and moves the accumulation into
    # the MXU; the patch copies are VMEM-local).
    if im2col:
        for t in range(9):
            dy, dx = t // 3, t % 3
            y1col[:, pl.ds(t * P, P)] = (
                y1p[pl.ds(dy, TH), pl.ds(dx, WP), :].reshape(TH * WP, P)
            )
        acc = jax.lax.dot_general(
            y1col[...], w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        acc = jnp.zeros((TH * WP, P), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                sl = y1p[pl.ds(dy, TH), pl.ds(dx, WP), :].reshape(TH * WP, P)
                acc += jax.lax.dot_general(
                    sl, w2_ref[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
    y2f = acc.astype(jnp.float32) * m2_ref[...] + t2_ref[...]
    y2 = jnp.clip(jnp.round(jnp.maximum(y2f, 0.0)), -127, 127).astype(jnp.int8)

    # conv3 (1x1, P -> C) + residual + relu + requant.
    a3 = jax.lax.dot_general(
        y2, w3_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    d_plus_1 = row0 - window_start(i)  # 0 (top) / 1 (interior) / 2 (bottom)
    res = (
        xt[slot, pl.ds(d_plus_1, TH), :, :]
        .reshape(TH * WP, C)
        .astype(jnp.float32)
    )
    outf = a3.astype(jnp.float32) * m3_ref[...] + t3_ref[...] + res * rx_ref[0]
    out = jnp.clip(jnp.round(jnp.maximum(outf, 0.0)), -127, 127)
    out = out.astype(jnp.int8).reshape(1, TH, WP, C)
    out_ref[...] = out if padded else out[:, :, :W, :]


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "interpret", "real_w", "im2col")
)
def fused_identity_bottleneck_int8(
    x_q, w1q, w2q, w3q, m1, t1, m2, t2, m3, t3, rx,
    tile_rows: int | None = None, interpret: bool = False,
    real_w: int | None = None, im2col: bool = True,
):
    """int8 identity bottleneck: (N, H, W, C) int8 -> (N, H, W, C) int8.

    w1q: (C, P), w2q: (3, 3, P, P), w3q: (P, C) int8 per-channel-quantized;
    m*/t*: per-channel requant fma constants; rx: residual rescale scalar
    (s_in / s_out). Numerics match serving.engine._block_xla.

    ``real_w``: when the logical width is not a multiple of 8 (the DMA
    sublane tile — layer3's 28, layer4's 14), the caller pads x to
    round_up(W, 32) columns and passes the logical width here; pad columns
    carry garbage that never influences real columns (the y1 halo window
    only ingests ``real_w`` columns) and stay in the output for the next
    chained block (serving.engine unpads at stage end).
    """
    N, H, W_phys, C = x_q.shape
    padded = real_w is not None and real_w != W_phys
    W = real_w if padded else W_phys
    P = w1q.shape[1]
    TH = tile_rows or default_tile_rows(H)
    assert H % TH == 0 and TH + 2 <= H, (H, TH)
    WP = W_phys if padded else _round_up(W, 32)
    assert WP % 32 == 0 and (padded or W % 8 == 0), (W, WP, padded)

    kern = functools.partial(
        _fused_identity_bottleneck_kernel,
        TH=TH, H=H, W=W, WP=WP, C=C, P=P, N=N, padded=padded, im2col=im2col,
    )
    grid = (N, H // TH)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]  # x stays in HBM
        + [vmem] * 9
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, TH, W_phys, C), lambda n, i: (n, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, H, W_phys, C), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, WP, C), jnp.int8),   # x double buffer
            pltpu.VMEM((TH + 2, WP + 2, P), jnp.int8),  # y1 halo window
            pltpu.VMEM((TH * WP, 9 * P if im2col else P), jnp.int8),  # patches
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        x_q, w1q,
        w2q.reshape(9 * P, P) if im2col else w2q,
        w3q,
        m1.reshape(1, -1), t1.reshape(1, -1),
        m2.reshape(1, -1), t2.reshape(1, -1),
        m3.reshape(1, -1), t3.reshape(1, -1),
        rx.reshape(1),
    )


def block_pallas(x_q, qb, tile_rows=None, interpret=False, real_w=None,
                 im2col=True):
    """serving.engine block-impl adapter for identity blocks."""
    return fused_identity_bottleneck_int8(
        x_q,
        qb["conv1"]["wq"].reshape(qb["conv1"]["wq"].shape[-2:]),
        qb["conv2"]["wq"],
        qb["conv3"]["wq"].reshape(qb["conv3"]["wq"].shape[-2:]),
        qb["conv1"]["m"], qb["conv1"]["t"],
        qb["conv2"]["m"], qb["conv2"]["t"],
        qb["conv3"]["m"], qb["conv3"]["t"],
        qb["rx"],
        tile_rows=tile_rows, interpret=interpret, real_w=real_w,
        im2col=im2col,
    )


# --------------------------------------------------------------- chain kernel
def _rq_i8(acc_i32, m, t, extra=None):
    y = acc_i32.astype(jnp.float32) * m + t
    if extra is not None:
        y = y + extra
    return jnp.clip(jnp.round(jnp.maximum(y, 0.0)), -127, 127).astype(jnp.int8)


def _chain_kernel(
    x_ref, *refs,
    NB: int, H: int, W: int, WP: int, CIN: int, C: int, P: int, CH: int,
    ds0: bool, W_phys: int,
):
    """Whole-image fused chain of NB stride-1 bottleneck blocks.

    refs = [per-block params...] + [out_ref] + [xin?, xa, xb, y1p] scratch.
    Per-block params: w1 (Cin, P), w2 (3, 3, P, P), w3 (P, C), m1, t1, m2,
    t2, m3, t3 (vectors, (1, P)/(1, C)) and, for the first block when
    ``ds0``, wd (CIN, C), md, td, rd (1,); otherwise rx (1,) in SMEM.
    """
    n_per = 9 + (4 if ds0 else 1)
    n_rest = 10
    n_params = n_per + (NB - 1) * n_rest
    params = refs[:n_params]
    out_ref = refs[n_params]
    scratch = refs[n_params + 1:]
    if CIN != C:
        xin, xa, xb, y1p = scratch
        nxt0 = xa
    else:
        xa, xb, y1p = scratch
        xin = xa
        nxt0 = xb

    # Load this image's input into the padded working buffer.
    xin[:, :W_phys, :] = x_ref[0]

    off = 0
    cur = xin
    nxt = nxt0
    for b in range(NB):
        if b == 0:
            w1, w2, w3, m1, t1, m2, t2, m3, t3 = params[off:off + 9]
            if ds0:
                wd, md, td, rd = params[off + 9:off + 13]
                rx = None
            else:
                rx = params[off + 9]
                wd = None
            off += n_per
        else:
            w1, w2, w3, m1, t1, m2, t2, m3, t3, rx = params[off:off + 10]
            wd = None
            off += n_rest

        cin = CIN if b == 0 else C
        # conv1 (1x1) over the full image in row chunks -> y1p halo window.
        y1p[...] = jnp.zeros_like(y1p)
        for r in range(0, H, CH):
            xf = cur[pl.ds(r, CH), :, :cin].reshape(CH * WP, cin)
            a1 = jax.lax.dot_general(
                xf, w1[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y1 = _rq_i8(a1, m1[...], t1[...]).reshape(CH, WP, P)
            y1p[pl.ds(r + 1, CH), pl.ds(1, W), :] = y1[:, :W]

        # conv2 (3x3 tap dots) + conv3 (1x1) + residual, in row chunks.
        for r in range(0, H, CH):
            acc = jnp.zeros((CH * WP, P), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    sl = y1p[pl.ds(r + dy, CH), pl.ds(dx, WP), :]
                    acc += jax.lax.dot_general(
                        sl.reshape(CH * WP, P), w2[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
            y2 = _rq_i8(acc, m2[...], t2[...])
            a3 = jax.lax.dot_general(
                y2, w3[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            res = cur[pl.ds(r, CH), :, :cin].reshape(CH * WP, cin)
            if wd is not None:
                ad = jax.lax.dot_general(
                    res, wd[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                dsf = ad.astype(jnp.float32) * md[...] + td[...]
                # Match serving.engine._block_xla's own-scale int8 branch
                # rounding + s_ds/s_out rescale so Pallas and XLA paths stay
                # bit-identical.
                extra = jnp.clip(jnp.round(dsf), -127, 127) * rd[0]
            else:
                extra = res.astype(jnp.float32) * rx[0]
            out = _rq_i8(a3, m3[...], t3[...], extra=extra)
            nxt[pl.ds(r, CH), :, :] = out.reshape(CH, WP, C)

        cur, nxt = nxt, (xb if nxt is xa else xa)

    out_ref[0] = cur[:, :W_phys, :]


def fused_identity_chain_int8(x_q, qblocks, interpret: bool = False,
                              chunk_rows: int | None = None,
                              real_w: int | None = None):
    """Run a stage's stride-1 bottleneck blocks as ONE whole-image kernel.

    The image (W padded to the int8 lane multiple in VMEM) stays on-chip
    across all NB blocks: HBM traffic is one image read + one image write
    for the entire chain, vs (2 reads + 1 write) x NB for the per-block
    path. The first block may carry a (stride-1) downsample projection —
    layer1's transition block — whose branch math matches the XLA engine's
    own-scale int8 epilogue (round + clip at s_ds, rescale by s_ds/s_out
    on add; engine._block_xla) bit-for-bit.
    """
    N, H, W_phys, CIN = x_q.shape
    W = real_w if (real_w is not None and real_w != W_phys) else W_phys
    first = qblocks[0]
    ds0 = first["downsample"] is not None
    C = first["conv3"]["wq"].shape[-1]
    P = first["conv1"]["wq"].shape[-1]
    NB = len(qblocks)
    WP = _round_up(W_phys, 32)
    assert WP == W_phys or W % 8 == 0, (W, W_phys)
    CH = chunk_rows or min(H, max(8, 128 // (WP // 32) // 4 * 4))
    while H % CH:
        CH //= 2
    assert H % CH == 0, (H, CH)

    flat = []
    for b, qb in enumerate(qblocks):
        cin = CIN if b == 0 else C
        flat += [
            qb["conv1"]["wq"].reshape(cin, P),
            qb["conv2"]["wq"],
            qb["conv3"]["wq"].reshape(P, C),
            qb["conv1"]["m"].reshape(1, P), qb["conv1"]["t"].reshape(1, P),
            qb["conv2"]["m"].reshape(1, P), qb["conv2"]["t"].reshape(1, P),
            qb["conv3"]["m"].reshape(1, C), qb["conv3"]["t"].reshape(1, C),
        ]
        if b == 0 and ds0:
            flat += [
                qb["downsample"]["wq"].reshape(cin, C),
                qb["downsample"]["m"].reshape(1, C),
                qb["downsample"]["t"].reshape(1, C),
                qb["ds_rescale"].reshape(1),
            ]
        else:
            flat += [qb["rx"].reshape(1)]

    kern = functools.partial(
        _chain_kernel, NB=NB, H=H, W=W, WP=WP, CIN=CIN, C=C, P=P, CH=CH,
        ds0=ds0, W_phys=W_phys,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [
        pl.BlockSpec((1, H, W_phys, CIN), lambda n: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    for b in range(NB):
        in_specs += [vmem] * 9
        if b == 0 and ds0:
            in_specs += [vmem] * 3 + [smem]  # wd, md, td + rd scalar
        else:
            in_specs += [smem]
    scratch = []
    if CIN != C:
        scratch.append(pltpu.VMEM((H, WP, CIN), jnp.int8))
    scratch += [
        pltpu.VMEM((H, WP, C), jnp.int8),
        pltpu.VMEM((H, WP, C), jnp.int8),
        pltpu.VMEM((H + 2, WP + 2, P), jnp.int8),
    ]
    return pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, W_phys, C), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W_phys, C), jnp.int8),
        scratch_shapes=scratch,
        # Whole-image buffers exceed the default 16 MB scoped-vmem cap at
        # 112^2 (measured need ~22 MB incl. the pipelined in/out blocks);
        # v5e VMEM is far larger (a 100 MB scratch probe compiles and runs).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_q, *flat)


def chain_pallas(x_q, qblocks, real_w=None, interpret=False, chunk_rows=None):
    """serving.engine stage-chain adapter (see engine.int8_forward)."""
    return fused_identity_chain_int8(
        x_q, qblocks, interpret=interpret, chunk_rows=chunk_rows,
        real_w=real_w,
    )


# ------------------------------------------- transition conv2 (3x3 stride 2)
#
# XLA's int8 3x3/s2 conv at 56^2x128 / 28^2x256 output runs 2.5-3.5x over its
# compute roofline (profiled: 2.23 / 1.32 ms @b256 vs ~0.6-0.9 floors) while
# its big-K dot path is fine — and Mosaic's int8 dot sustains >=165-283 TOPS
# once K and N are >=128-multiples (experiments/mosaic_int8_dot.py; N=64
# geometries run at 12-31 TOPS, which is why the bottleneck-chain kernels
# above lose at layer1). This kernel therefore re-expresses the strided conv
# as two DENSE dots with zero padded-MAC waste:
#
# - Columns: the caller views y1 (N,H,W,C) as (N,H,W/2,2C) — a free bitcast
#   that packs column pairs ("superpixels") into channels, turning the
#   column stride into weight layout. Output col j taps cols 2j-1..2j+1 =
#   the odd half of superpixel j-1 plus ALL of superpixel j: one K=3C dot
#   (odd halves) + one K=3*2C dot (full superpixels), both dense.
# - Rows: the padded buffer's row dim (H+2) reshapes outer-dim-free to
#   ((H+2)/2, 2) row pairs; the three row taps are plain pair/phase slices
#   (Mosaic supports no strided slicing at all — probed on-device).
#
# Integer accumulation is a reordering of the same 9-tap sum, so results are
# bit-identical to engine._conv_i8 + _requant (tests/test_serving.py).


def _transition_conv2_kernel(
    x_ref, wa_ref, wb_ref, m_ref, t_ref, out_ref, xp,
    *, H: int, WP: int, C2: int, IPS: int,
):
    C = C2 // 2
    HP = H // 2  # output rows/cols
    # Padded buffer: rows +1 top/bottom, one zero superpixel (cols -2,-1)
    # left. xp: (IPS, H + 2, WP + 1, C2).
    xp[...] = jnp.zeros_like(xp)
    xp[:, 1 : H + 1, 1 : WP + 1, :] = x_ref[...]

    xpr = xp[...].reshape(IPS, (H + 2) // 2, 2, WP + 1, C2)
    # Row taps for output row i: padded rows 2i, 2i+1, 2i+2 =
    # (pair i, ph 0), (pair i, ph 1), (pair i+1, ph 0) = dy -1, 0, +1.
    taps = ((0, 0), (0, 1), (1, 0))
    m = IPS * HP * HP
    pa = []
    pb = []
    for a, p in taps:
        # A: full superpixel j+1 (padded col slice 1..WP) -> dx = 0, +1.
        pa.append(
            xpr[:, a : a + HP, p, 1 : WP + 1, :].reshape(m, C2)
        )
        # B: odd half of superpixel j (padded col slice 0..WP-1) -> dx = -1.
        pb.append(
            xpr[:, a : a + HP, p, 0:WP, C:C2].reshape(m, C)
        )
    acc = jax.lax.dot_general(
        jnp.concatenate(pa, axis=1), wa_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc += jax.lax.dot_general(
        jnp.concatenate(pb, axis=1), wb_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = _rq_i8(acc, m_ref[...], t_ref[...])
    out_ref[...] = out.reshape(IPS, HP, HP, C)


def transition_conv2_weights(w_q):
    """(3, 3, C, C) int8 kernel -> (wA (6C, C), wB (3C, C)) dense dot weights.

    Row-tap order dy = -1, 0, +1; within each A row-tap the superpixel's
    even slot is the dx=0 tap and the odd slot the dx=+1 tap; B carries the
    dx=-1 taps.
    """
    C = w_q.shape[2]
    wa = jnp.concatenate(
        [jnp.concatenate([w_q[ky, 1], w_q[ky, 2]], axis=0) for ky in range(3)],
        axis=0,
    )
    wb = jnp.concatenate([w_q[ky, 0] for ky in range(3)], axis=0)
    assert wa.shape == (6 * C, C) and wb.shape == (3 * C, C)
    return wa, wb


@functools.partial(
    jax.jit, static_argnames=("images_per_step", "interpret")
)
def transition_conv2_int8(x_q, w_q, mm, tt, images_per_step: int = 0,
                          interpret: bool = False):
    """3x3 stride-2 pad-1 int8 conv + requant: (N,H,H,C) -> (N,H/2,H/2,C).

    Bit-identical to engine's lax conv + _requant. H must be even; C a
    multiple of 128 (layer2/3 transitions: 112^2x128, 56^2x256).
    """
    N, H, W, C = x_q.shape
    assert H == W and H % 2 == 0 and C % 128 == 0, (H, W, C)
    # ~25 MB of scoped VMEM per step (padded buffer + patches + s32 acc +
    # pipelined in/out blocks): 2 images at 112^2x128, 4 at 56^2x256.
    IPS = images_per_step or max(1, 256 // H)
    while N % IPS:
        IPS -= 1
    WP = W // 2
    C2 = 2 * C
    xr = x_q.reshape(N, H, WP, C2)
    wa, wb = transition_conv2_weights(w_q)

    kern = functools.partial(
        _transition_conv2_kernel, H=H, WP=WP, C2=C2, IPS=IPS,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(N // IPS,),
        in_specs=[
            pl.BlockSpec((IPS, H, WP, C2), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem, vmem, vmem, vmem,
        ],
        out_specs=pl.BlockSpec((IPS, H // 2, H // 2, C),
                               lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H // 2, H // 2, C), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((IPS, H + 2, WP + 1, C2), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xr, wa, wb, mm.reshape(1, C), tt.reshape(1, C))


def transition_conv2_pallas(y1_q, qc, interpret=False, images_per_step=0):
    """serving.engine conv2-impl adapter for stride-2 transition blocks."""
    return transition_conv2_int8(
        y1_q, qc["wq"], qc["m"], qc["t"],
        images_per_step=images_per_step, interpret=interpret,
    )
