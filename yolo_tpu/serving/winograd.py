"""Winograd F(2x2, 3x3) int8 path for compute-bound 3x3/s1 convs.

Targets the serving ops that sit at the DIRECT-conv int8 compute bound
(PARITY.md ledger @b256/448²: head conv1 5.25 ms at ~394 TOPS, layer3/4
identity conv2s at their compute floors). Winograd F(2,3) computes each
2x2 output tile from a 4x4 input tile with 16 multiplies instead of 36 —
a 2.25x MAC reduction — so the compute FLOOR itself drops; every other
lever in the ledger could only approach the direct-conv floor.

Quantization scheme (per-tap, a la LoWino):
- The input transform ``V = Bᵀ x̃ B`` is exact integer arithmetic on the
  int8 activation grid (B entries ∈ {0,±1}; |V| ≤ 4·127), computed in i32.
- Each of the 16 taps gets its OWN calibrated activation scale
  ``d_t = max|V_t|/127`` (recorded by the calibration pass in real units,
  converted to int8-grid units here) — the tap ranges differ by up to 4x,
  so per-tap scaling keeps ~2 bits that a worst-case /4 shift would lose.
- Weight taps ``U = G w Gᵀ`` are built from the FOLDED fp32 weights and
  quantized per (tap, out-channel) — the transform never touches int8
  weights, so its non-integer G entries cost nothing.
- The tap dots run int8 x int8 -> i32 on the MXU at full-fill geometry
  (K=C, N=Cout — e.g. 2048x1024 for head conv1, the 283-TOPS regime of
  experiments/mosaic_int8_dot.py, vs 12-31 TOPS for the N=64 shapes that
  killed the round-2 bottleneck kernels).
- The inverse transform ``Y = Aᵀ M A`` (A entries ∈ {0,±1}) runs in f32
  on the dequantized taps; bias/leaky/requant epilogue matches
  engine._requant exactly.

NOT bit-exact vs the direct conv (the tap requant adds bounded rounding
error); gated like every other engine approximation by
tools/quant_accuracy.py (mAP50 delta ≤ 1 pt at the 448² deployment point).

Reference op being accelerated: the DetectionHead convs of
/root/reference/src/yolo/models.py:313-322 (and the ResNet 3x3 conv2s of
torchvision's bottleneck, mirrored at yolo_tpu/models/backbones.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# F(2x2, 3x3) transform matrices (Lavin & Gray 2016, eq. F(2,3)).
B_T = np.array(
    [[1, 0, -1, 0],
     [0, 1, 1, 0],
     [0, -1, 1, 0],
     [0, 1, 0, -1]], dtype=np.float32)
G = np.array(
    [[1.0, 0.0, 0.0],
     [0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5],
     [0.0, 0.0, 1.0]], dtype=np.float32)
A_T = np.array(
    [[1, 1, 1, 0],
     [0, 1, -1, -1]], dtype=np.float32)


def _tile_slices(xp, n_tiles: int):
    """(N, 2T+2, 2T+2, C) padded input -> 16 views (N, T, T, C).

    tile[(u, v)][n, i, j, c] = xp[n, 2i+u, 2j+v, c] — the (u, v) element of
    every 4x4 Winograd input tile. Formulated as a parity-split reshape
    (free, row-major) + plain slices rather than 16 stride-2 ``lax.slice``s:
    two or more of those strided-slice clusters in one compiled graph
    reproducibly crash the axon TPU worker ("kernel fault", bisected in
    round 3), and the parity view is what the Pallas kernel uses anyway.
    """
    n, hp, wp, c = xp.shape
    x5 = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    views = []
    for u in range(4):
        du, pu = divmod(u, 2)
        for v in range(4):
            dv, pv = divmod(v, 2)
            views.append(
                x5[:, du : du + n_tiles, pu, dv : dv + n_tiles, pv, :]
            )
    return views


def input_taps_i32(x_q, n_tiles: int):
    """int8 activations -> 16 exact i32 Winograd taps (N, T, T, C).

    Applies Bᵀ·B on the 4x4 tile grid as signed sums of the 16 strided
    element views (each tap touches ≤ 4 of them, coefficients ∈ {0,±1}).
    Odd spatial dims get an extra zero row/col on the bottom/right (the
    caller crops the surplus output row/col; the conv's own zero padding
    makes the shared real outputs exact).
    """
    h = x_q.shape[1]
    w = x_q.shape[2]
    xp = jnp.pad(
        x_q.astype(jnp.int32),
        ((0, 0), (1, 2 * n_tiles + 1 - h), (1, 2 * n_tiles + 1 - w), (0, 0)),
    )
    t = _tile_slices(xp, n_tiles)

    def e(u, v):
        return t[u * 4 + v]

    taps = []
    for a in range(4):
        # row combo: r[v] = sum_u B_T[a, u] * e(u, v)
        rows = []
        for v in range(4):
            acc = None
            for u in range(4):
                c = int(B_T[a, u])
                if c == 0:
                    continue
                term = e(u, v) if c > 0 else -e(u, v)
                acc = term if acc is None else acc + term
            rows.append(acc)
        for b in range(4):
            acc = None
            for v in range(4):
                c = int(B_T[b, v])
                if c == 0:
                    continue
                term = rows[v] if c > 0 else -rows[v]
                acc = term if acc is None else acc + term
            taps.append(acc)
    return taps  # length 16, each (N, T, T, C) i32


def tap_maxima(x) -> jnp.ndarray:
    """(16,) max|Bᵀ x B| over a float activation batch (calibration hook).

    ``x`` is the conv's fp input (N, H, W, C); pad 1 as the conv does
    (odd dims get the same bottom/right zero extension as the forward).
    Units are real activation units; quant.py converts to the int8 grid by
    dividing by the input scale.
    """
    h, w = x.shape[1], x.shape[2]
    n_tiles = (max(h, w) + 1) // 2
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (1, 2 * n_tiles + 1 - h), (1, 2 * n_tiles + 1 - w), (0, 0)),
    )
    t = _tile_slices(xp, n_tiles)
    e = lambda u, v: t[u * 4 + v]  # noqa: E731
    maxima = []
    for a in range(4):
        rows = []
        for v in range(4):
            acc = 0.0
            for u in range(4):
                c = float(B_T[a, u])
                if c != 0.0:
                    acc = acc + c * e(u, v)
            rows.append(acc)
        for b in range(4):
            acc = 0.0
            for v in range(4):
                c = float(B_T[b, v])
                if c != 0.0:
                    acc = acc + c * rows[v]
            maxima.append(jnp.max(jnp.abs(acc)))
    return jnp.stack(maxima)


def wino_quantize(w, b, s_in: float, s_out: float, tap_max_real) -> Dict:
    """Folded fp32 conv params -> Winograd int8 engine params.

    tap_max_real: (16,) calibrated max|Bᵀ x B| in REAL units (tap_maxima).
    Returns {"uq" (16, C, K) i8, "mw" (16, 1, K) f32, "t" (K,) f32,
             "dinv" (16, 1, 1) f32}.
    """
    w = jnp.asarray(w, jnp.float32)  # (3, 3, C, K)
    # U[t=(a,b), c, k] = sum_{i,j} G[a,i] G[b,j] w[i,j,c,k]
    u = jnp.einsum("ai,bj,ijck->abck", jnp.asarray(G), jnp.asarray(G), w)
    u = u.reshape(16, w.shape[2], w.shape[3])
    su = jnp.maximum(jnp.max(jnp.abs(u), axis=1, keepdims=True) / 127.0,
                     1e-12)  # (16, 1, K)
    uq = jnp.clip(jnp.round(u / su), -127, 127).astype(jnp.int8)
    # Tap scale on the int8 grid: d_t = (max|V_t|_real / s_in) / 127.
    d = jnp.maximum(jnp.asarray(tap_max_real, jnp.float32) / s_in, 1.0) / 127.0
    # M_q[t] * d_t * su[t,k] * s_in = conv accumulation in real units.
    mw = (d[:, None, None] * su * s_in / s_out).astype(jnp.float32)
    return {
        "uq": uq,
        "mw": mw,
        "t": (jnp.asarray(b, jnp.float32) / s_out),
        "dinv": (1.0 / d)[:, None, None].astype(jnp.float32),
    }


def wino_points_of(q: Dict) -> Tuple[str, ...]:
    """Conv names carrying per-tap Winograd params in an engine q-dict.

    Artifact loaders (inference.py / evaluate.py ``--engine``) use this to
    re-install the matching ``impl`` hooks (wino_impl_hooks) so a saved
    wino engine round-trips to the same forward, not a silent direct-conv
    fallback.
    """
    names = []
    for si, blocks in enumerate(q.get("layers", ())):
        for bi, qb in enumerate(blocks):
            if "wino" in qb.get("conv2", {}):
                names.append(f"l{si + 1}b{bi}_conv2")
    for i in range(1, 5):
        if "wino" in q.get("head", {}).get(f"conv{i}", {}):
            names.append(f"head_conv{i}")
    return tuple(names)


def wino_impl_hooks(wino, impl: Dict | None = None) -> Dict:
    """Engine ``impl`` hooks for the named Winograd convs.

    Head convs use the leaky epilogue; backbone conv2s plain ReLU —
    mirrors engine._requant's call sites.
    """
    from functools import partial

    impl = dict(impl or {})
    for name in wino:
        if name.startswith("head_conv"):
            impl[name] = partial(conv3x3_wino_auto, leaky=True)
        else:  # "l{s}b{b}_conv2"
            impl.setdefault("conv2_s1", {})[name.removesuffix("_conv2")] = \
                partial(conv3x3_wino_auto, leaky=False)
    return impl


def conv3x3_wino_auto(x_q, qc, leaky: bool = True):
    """Dispatch: the fused Pallas wino kernel where it lowers (TPU backend,
    even square spatial dims), the XLA formulation otherwise (CPU tests,
    odd 7² head convs). Both compute the same per-tap quantized conv."""
    h, w = x_q.shape[1], x_q.shape[2]
    if jax.default_backend() == "tpu" and h == w and h % 2 == 0:
        from yolo_tpu.serving.pallas_wino import conv3x3_wino_pallas

        return conv3x3_wino_pallas(x_q, qc, leaky=leaky)
    return conv3x3_wino_rq(x_q, qc, leaky=leaky)


def conv3x3_wino_rq(x_q, qc, leaky: bool = True):
    """3x3/s1/p1 int8 conv + requant via per-tap int8 Winograd F(2,3).

    Engine ``impl`` hook signature: (x_q, qc) -> int8, where qc carries
    the standard direct-conv params plus qc["wino"] (wino_quantize).
    """
    qw = qc["wino"]
    n, h, w_, c = x_q.shape
    th = tw = (max(h, w_) + 1) // 2  # odd dims: surplus row/col cropped below
    taps = input_taps_i32(x_q, th)
    v = jnp.stack([t.reshape(n * th * tw, c) for t in taps])  # (16, M, C) i32
    # Per-tap requant of the exact integer taps to int8.
    vq = jnp.clip(
        jnp.round(v.astype(jnp.float32) * qw["dinv"]), -127, 127
    ).astype(jnp.int8)
    # 16 full-fill int8 dots: (16, M, C) x (16, C, K) -> (16, M, K) i32.
    mq = lax.dot_general(
        vq, qw["uq"],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    m = mq.astype(jnp.float32) * qw["mw"]  # dequant, fused dot epilogue
    k = m.shape[-1]
    # Inverse transform Y[p] = sum_t A2[p, t] M[t], A2 = A_T ⊗ A_T (4 x 16).
    a2 = jnp.asarray(np.einsum("ra,sb->rsab", A_T, A_T).reshape(4, 16))
    y = jnp.einsum("pt,tmk->pmk", a2, m)  # (4, M, K) f32
    y = y + qc["wino"]["t"]
    y = jnp.where(y > 0, y, 0.1 * y) if leaky else jnp.maximum(y, 0.0)
    y = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    # Scatter the 2x2 output tiles back: y[(r,s), n, i, j, k] -> (n, 2i+r, 2j+s, k)
    y = y.reshape(2, 2, n, th, tw, k).transpose(2, 3, 0, 4, 1, 5)
    y = y.reshape(n, 2 * th, 2 * tw, k)
    if 2 * th != h or 2 * tw != w_:
        y = y[:, :h, :w_, :]
    return y
