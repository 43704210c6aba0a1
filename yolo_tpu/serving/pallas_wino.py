"""Pallas TPU kernel: fused per-tap int8 Winograd F(2,3) 3x3/s1 conv.

MEASURED NEGATIVE RESULT (round 3, kept as a tested opt-in): 2.60 ms vs
XLA's direct int8 conv 2.43 ms at head-conv1 geometry (b256, 14², 1024→1024)
— Mosaic serializes the VPU transform half (0.74 ms) with the MXU dots
(1.63 ms at ~296 TOPS), so the 2.25× MAC saving never materializes; full
ablation + analysis in PARITY.md's Winograd bullet and
experiments/wino_ablate.py.

The XLA formulation of serving/winograd.py loses 25 ms e2e @b256 because
every transform stage round-trips HBM (16 strided tap gathers -> stack ->
requant -> batched dot -> dequant -> tap contraction -> tile scatter), while
the tap DOTS themselves run at 339-352 TOPS (measured, experiments note in
PARITY.md). This kernel keeps the whole transform domain in VMEM:

  HBM traffic = read x (int8) + resident U taps (int8) + write y (int8)
  MXU work    = 16 full-fill dots per image chunk (K=C, N=Cout)
  VPU work    = tap build (integer adds of {0,±1} combos), per-tap requant,
                inverse transform + leaky requant epilogue

Addressing trick (no strided slicing in Mosaic): the padded input is viewed
as (H/2, 2, W/2, 2C) — H parity becomes a leading index, W parity becomes a
lane-group slice (both free row-major views, cf. pallas_stem.py) — so all 16
Winograd tile-element views are plain contiguous slices. Output tiles are
scattered through the mirrored views of the output block.

Numerics are IDENTICAL to serving/winograd.py::conv3x3_wino_rq (same taps,
same per-tap scales, same f32 epilogue) up to f32 op order in the inverse
transform; correctness is pinned by tests (interpret mode + against the XLA
wino path) and accuracy is gated by tools/quant_accuracy.py --wino.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolo_tpu.serving.winograd import A_T, B_T


def _wino_kernel(dinv_ref, x_ref, u_ref, mw_ref, b_ref, out_ref,
                 xp_ref, vq_ref, y_ref, *, IMG: int, H: int, C: int, K: int,
                 leaky: bool):
    """One grid step: IMG images (IMG, H, H, C) -> (IMG, H, H, K).

    T = H//2 tile rows; TW = T+1 padded tile cols (the extra col reads
    zeros and its outputs are dropped). M = IMG * T * TW dot rows.
    """
    T = H // 2
    TW = T + 1
    M1 = T * TW  # rows per image

    # ---- padded input: interior copy + zero borders --------------------
    # xp: (IMG, H+2, 2*TW+2, C) int8; filled cols 1..H, zero elsewhere.
    WP = 2 * TW + 2
    xp_ref[:, 0, :, :] = jnp.zeros((IMG, WP, C), jnp.int8)
    xp_ref[:, H + 1, :, :] = jnp.zeros((IMG, WP, C), jnp.int8)
    xp_ref[:, 1 : H + 1, 0, :] = jnp.zeros((IMG, H, C), jnp.int8)
    for w in range(H + 1, WP):
        xp_ref[:, 1 : H + 1, w, :] = jnp.zeros((IMG, H, C), jnp.int8)
    xp_ref[:, 1 : H + 1, 1 : H + 1, :] = x_ref[:, :, :, :]

    # ---- tap build + per-tap int8 requant ------------------------------
    # Free views: H+2 rows -> (T+1, 2) leading split; (WP, C) -> (WP/2, 2C).
    xp = xp_ref[:, :, :, :]
    xp2 = xp.reshape(IMG, T + 1, 2, WP // 2, 2 * C)

    # e[u][v]: (IMG, T, TW, C) i32 — Winograd tile element (u, v) across the
    # (T, TW) tile grid of every chunk image at once (one wide VPU op per
    # combo term; a per-image formulation was 16x more, tiny, ops).
    e = [[None] * 4 for _ in range(4)]
    for u in range(4):
        du, pu = u // 2, u % 2
        for v in range(4):
            dv, pv = v // 2, v % 2
            e[u][v] = xp2[
                :, du : du + T, pu, dv : dv + TW,
                pv * C : (pv + 1) * C,
            ].astype(jnp.int32)

    def build_tap(t_idx):
        """tap (a, b): Bᵀ·B combo of e views + per-tap requant -> vq_ref."""
        a, b = t_idx // 4, t_idx % 4
        acc = None
        for v in range(4):
            cv = int(B_T[b, v])
            if cv == 0:
                continue
            row = None
            for u in range(4):
                cu = int(B_T[a, u])
                if cu == 0:
                    continue
                term = e[u][v] if cu > 0 else -e[u][v]
                row = term if row is None else row + term
            term = row if cv > 0 else -row
            acc = term if acc is None else acc + term
        vq = jnp.clip(
            jnp.round(acc.astype(jnp.float32) * dinv_ref[t_idx]),
            -127.0, 127.0,
        ).astype(jnp.int8)
        vq_ref[t_idx, :, :] = vq.reshape(IMG * M1, C)

    # ---- software-pipelined: dot t (MXU) issued between tap build t+1 and
    # inverse accumulation t-1 (both VPU) so the independent units overlap.
    a2 = np.einsum("ra,sb->rsab", A_T, A_T).reshape(4, 16)
    first = [True] * 4

    def accumulate(t, acc):
        mf = acc.astype(jnp.float32) * mw_ref[t, :, :]
        for p in range(4):
            cpt = float(a2[p, t])
            if cpt == 0.0:
                continue
            term = mf if cpt > 0 else -mf
            if first[p]:
                y_ref[p, :, :] = term
                first[p] = False
            else:
                y_ref[p, :, :] = y_ref[p, :, :] + term

    build_tap(0)
    pending = None  # (t, i32 dot result) awaiting dequant+accumulate
    for t in range(16):
        acc = jax.lax.dot_general(
            vq_ref[t, :, :], u_ref[t, :, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if t + 1 < 16:
            build_tap(t + 1)
        if pending is not None:
            accumulate(*pending)
        pending = (t, acc)
    accumulate(*pending)

    # ---- epilogue + tile scatter ---------------------------------------
    # out block (IMG, H, H, K) viewed as (IMG, T, 2, T, 2K): row/col parity
    # of each 2x2 output tile become a leading index / lane-group slice.
    for p in range(4):
        r, s_ = p // 2, p % 2
        y = y_ref[p, :, :] + b_ref[0, :]
        y = jnp.where(y > 0, y, 0.1 * y) if leaky else jnp.maximum(y, 0.0)
        yq = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
        yq = yq.reshape(IMG, T, TW, K)
        out_ref[:, :, r, :, s_ * K : (s_ + 1) * K] = yq[:, :, :T, :]


@functools.partial(
    jax.jit, static_argnames=("leaky", "img_chunk", "interpret")
)
def _wino_conv(x_q, uq, mw, bias, dinv, leaky: bool, img_chunk: int,
               interpret: bool):
    n, h, w, c = x_q.shape
    k = uq.shape[-1]
    assert h == w and h % 2 == 0, (h, w)
    assert n % img_chunk == 0, (n, img_chunk)
    T = h // 2
    out5 = pl.pallas_call(
        functools.partial(
            _wino_kernel, IMG=img_chunk, H=h, C=c, K=k, leaky=leaky
        ),
        grid=(n // img_chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dinv (16,)
            pl.BlockSpec((img_chunk, h, w, c), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((16, c, k), lambda g: (0, 0, 0)),     # U resident
            pl.BlockSpec((16, 1, k), lambda g: (0, 0, 0)),     # mw
            pl.BlockSpec((1, k), lambda g: (0, 0)),            # bias
        ],
        out_specs=pl.BlockSpec(
            (img_chunk, T, 2, T, 2 * k), lambda g: (g, 0, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, T, 2, T, 2 * k), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((img_chunk, h + 2, 2 * (T + 1) + 2, c), jnp.int8),
            pltpu.VMEM((16, img_chunk * T * (T + 1), c), jnp.int8),
            pltpu.VMEM((4, img_chunk * T * (T + 1), k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(dinv, x_q, uq, mw, bias.reshape(1, k))
    # (N, T, 2, T, 2K) == (N, H, W, K) row-major: free view back.
    return out5.reshape(n, h, w, k)


def conv3x3_wino_pallas(x_q, qc, leaky: bool = True, img_chunk: int = 4,
                        interpret: bool = False):
    """Engine ``impl`` hook: fused Winograd conv (same contract/params as
    serving/winograd.py::conv3x3_wino_rq)."""
    qw = qc["wino"]
    n = x_q.shape[0]
    while n % img_chunk:
        img_chunk //= 2
    return _wino_conv(
        x_q, qw["uq"], qw["mw"], qw["t"],
        qw["dinv"].reshape(16), leaky, img_chunk, interpret,
    )
