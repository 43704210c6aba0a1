"""Pallas fused train-mode BatchNorm(+residual)+ReLU with a custom VJP.

OUTCOME (v5e-1, b128/448² flagship step — PARITY.md "Fused-BN experiment"):
both modes LOSE to unfused XLA e2e: "full" custom_vjp 379 ms (337 img/s),
"stats"-only 267 ms (480 img/s), vs 251 ms (509 img/s) baseline. The
kernels themselves stream at ~0.85x HBM peak, but XLA's conv-epilogue /
conv-read fusions get the same reductions as near-free extra outputs of
passes it already makes — a standalone pass at 0.85x peak cannot beat a
fused one at ~0x marginal cost. Kept, tested, and off by default as the
written record of that measurement.

Why it was attempted — and the measurement error that oversold it: the
original tools/profile_layers.py --train reading put ~100 ms/iter in XLA's
BN-chain fusions at 130–330 GB/s. That reading treated 4-iteration trace
SUMS as per-iteration durations (tool since fixed to divide by --iters);
the true per-iter BN-chain cost is ~25 ms running at ~1.3–1.6x over each
fusion's bandwidth floor — i.e. ~6–10 ms/step of real slack, which is less
than the extra standalone read passes these kernels add. The corrected
profile is consistent with the e2e outcome above and with the step's 0.87x
of the derived compiler bound (PARITY.md training section).

Semantics match ``flax.linen.BatchNorm(momentum=0.9, epsilon=1e-5)`` in
train mode (reference: torch BatchNorm2d defaults, src/yolo/models.py
bottlenecks; flax fast-variance recipe ``var = E[x²] − E[x]²`` with f32
stats and bf16 normalize output), fused with the bottleneck's residual-add
and ReLU (models/backbones.py::Bottleneck).

HBM pass structure per BN over an (N, H, W, C) activation:
  fwd: stats read (1R) + normalize read/write (1R+1W, +1R residual)
  bwd: reduction read of g/out/x (3R) + dx read/write (3R+1W, +1W dres)

Layout discipline — the part that makes this viable at all: XLA:TPU lays
conv activations out as {3,0,2,1} (C minor, batch next) for C>=128 and
{0,3,2,1} (batch minor — N fills the lanes, the batch-as-matmul-columns
trick) for C=64. A Pallas custom call constrains its operands to the
default layout of their logical shape, so a naive (N·H·W, C) reshape
forces a full relayout copy of every activation at every BN boundary
(~400 MB temps each — the first attempt OOM'd b128). BN statistics are
row-order agnostic, so instead each tensor is viewed through the
byte-identical logical permutation of its expected physical layout —
(H, W, N, C)->(H·W·N, C) "cmin" for C>=128, (H, W, C, N)->(H·W·C, N)
"nmin" for C<128 — and layout assignment turns every transpose+reshape at
the kernel boundary into a bitcast. In nmin mode the kernel
reduces/broadcasts per channel by viewing each (bm, N) block as
(bm/C, C, N); N occupies the full 128-lane width.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_BM = 8192
_VMEM = 100 * 1024 * 1024


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mode(c: int) -> str:
    return "cmin" if c >= 128 else "nmin"


def _view2d(x, mode):
    """(N,H,W,C) -> 2-D view matching XLA's conv layout (a bitcast on TPU)."""
    n, h, w, c = x.shape
    if mode == "nmin":
        return jnp.transpose(x, (1, 2, 3, 0)).reshape(h * w * c, n)
    return jnp.transpose(x, (1, 2, 0, 3)).reshape(h * w * n, c)


def _unview2d(y2, shape, mode):
    n, h, w, c = shape
    if mode == "nmin":
        return jnp.transpose(y2.reshape(h, w, c, n), (3, 0, 1, 2))
    return jnp.transpose(y2.reshape(h, w, n, c), (2, 0, 1, 3))


def _pick_bm(m: int, lanes: int, group: int) -> int:
    # ~4 MB bf16 tiles (3-operand kernels + double buffering stay in VMEM
    # at C=2048); shrink to a divisor of M that keeps whole channel groups.
    bm = _BM
    while bm * lanes > 2 * 1024 * 1024:
        bm //= 2
    while m % bm:
        bm //= 2
    return max(bm, group)


# --------------------------------------------------------------------- stats
def _stats_kernel(x_ref, out_ref, *, nm_c: int):
    """Accumulate per-channel [sum, sum_sq] f32 across grid steps."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xf = x_ref[...].astype(jnp.float32)
    if nm_c:
        bm, n = xf.shape
        x3 = xf.reshape(bm // nm_c, nm_c, n)
        out_ref[0, :] += jnp.sum(x3, axis=(0, 2))
        out_ref[1, :] += jnp.sum(x3 * x3, axis=(0, 2))
    else:
        out_ref[0, :] += jnp.sum(xf, axis=0)
        out_ref[1, :] += jnp.sum(xf * xf, axis=0)


def bn_stats(x, *, interpret: Optional[bool] = None):
    """(N,H,W,C) -> (mean, var) f32 per channel, flax fast-variance recipe."""
    interpret = _auto_interpret() if interpret is None else interpret
    n, h, w, c = x.shape
    mode = _mode(c)
    x2 = _view2d(x, mode)
    m, lanes = x2.shape
    nm_c = c if mode == "nmin" else 0
    bm = _pick_bm(m, lanes, nm_c or 1)
    sums = pl.pallas_call(
        functools.partial(_stats_kernel, nm_c=nm_c),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, lanes), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM
        ),
        interpret=interpret,
    )(x2)
    count = n * h * w
    mean = sums[0] / count
    var = jnp.maximum(0.0, sums[1] / count - mean * mean)
    return mean, var


# ----------------------------------------------------------------- normalize
def _affine(s_ref, i, xf, nm_c: int):
    """xf * s[2i] + s[2i+1] with per-channel vectors, either layout."""
    if nm_c:
        bm, n = xf.shape
        x3 = xf.reshape(bm // nm_c, nm_c, n)
        y = x3 * s_ref[2 * i, :].reshape(nm_c, 1) + s_ref[
            2 * i + 1, :
        ].reshape(nm_c, 1)
        return y.reshape(bm, n)
    return xf * s_ref[2 * i, :] + s_ref[2 * i + 1, :]


def _norm_kernel(s_ref, x_ref, out_ref, *, relu: bool, nm_c: int):
    y = _affine(s_ref, 0, x_ref[...].astype(jnp.float32), nm_c)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[...] = y.astype(out_ref.dtype)


def _norm_res_kernel(s_ref, x_ref, r_ref, out_ref, *, relu: bool, nm_c: int):
    y = _affine(s_ref, 0, x_ref[...].astype(jnp.float32), nm_c)
    # Match the unfused graph's op order: the BN output rounds to bf16
    # BEFORE the bf16 residual add (backbones.py: bn3(out) + identity).
    y = y.astype(out_ref.dtype) + r_ref[...]
    if relu:
        y = jnp.maximum(y.astype(jnp.float32), 0.0)
    out_ref[...] = y.astype(out_ref.dtype)


def _elem_call(kernel, scalars, arrays, out_dtypes, nm_c, *, interpret):
    """Shared pallas_call plumbing for the streaming elementwise kernels.

    ``scalars``: (k, C) f32. ``arrays``: identically-shaped 2-D views.
    ``out_dtypes``: one dtype, or a list for multi-output kernels.
    ``nm_c``: 0 for cmin (channels on lanes), else C for nmin grouping.
    """
    m, lanes = arrays[0].shape
    bm = _pick_bm(m, lanes, nm_c or 1)
    multi = isinstance(out_dtypes, (list, tuple))
    blk = pl.BlockSpec((bm, lanes), lambda i: (i, 0))
    out_specs = [blk] * len(out_dtypes) if multi else blk
    out_shape = (
        [jax.ShapeDtypeStruct((m, lanes), d) for d in out_dtypes]
        if multi
        else jax.ShapeDtypeStruct((m, lanes), out_dtypes)
    )
    return pl.pallas_call(
        functools.partial(kernel, nm_c=nm_c),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec(scalars.shape, lambda i: (0, 0))]
        + [blk] * len(arrays),
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM
        ),
        interpret=interpret,
    )(scalars, *arrays)


def bn_normalize(x, mul, add, residual=None, relu=True,
                 *, interpret: Optional[bool] = None):
    """y = relu?(x·mul + add (+ residual)) over NHWC — one streaming pass."""
    interpret = _auto_interpret() if interpret is None else interpret
    c = x.shape[-1]
    mode = _mode(c)
    scal = jnp.stack([mul.astype(jnp.float32), add.astype(jnp.float32)])
    arrays = [_view2d(x, mode)]
    kernel = _norm_kernel
    if residual is not None:
        arrays.append(_view2d(residual, mode))
        kernel = _norm_res_kernel
    out = _elem_call(functools.partial(kernel, relu=relu), scal, arrays,
                     x.dtype, c if mode == "nmin" else 0,
                     interpret=interpret)
    return _unview2d(out, x.shape, mode)


# ------------------------------------------------------------------ backward
def _bwd_reduce_kernel(s_ref, g_ref, o_ref, x_ref, out_ref, *, relu: bool,
                       nm_c: int):
    """Per-channel [Σ gz, Σ gz·x̂]; gz = g·(out>0), x̂ = (x−μ)·r."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = g_ref[...].astype(jnp.float32)
    if relu:
        # Mosaic has no bf16 vector compare; mask in f32.
        g = jnp.where(o_ref[...].astype(jnp.float32) > 0, g, 0.0)
    # x̂ = x·r − μ·r (per-channel affine; scalar rows [r, −μ·r])
    xh = _affine(s_ref, 0, x_ref[...].astype(jnp.float32), nm_c)
    if nm_c:
        bm, n = g.shape
        out_ref[0, :] += jnp.sum(g.reshape(bm // nm_c, nm_c, n), axis=(0, 2))
        out_ref[1, :] += jnp.sum(
            (g * xh).reshape(bm // nm_c, nm_c, n), axis=(0, 2)
        )
    else:
        out_ref[0, :] += jnp.sum(g, axis=0)
        out_ref[1, :] += jnp.sum(g * xh, axis=0)


def _scale_chan(s_ref, row, v, nm_c: int):
    """v * s[row] with a per-channel vector, either layout."""
    if nm_c:
        bm, n = v.shape
        out = v.reshape(bm // nm_c, nm_c, n) * s_ref[row, :].reshape(nm_c, 1)
        return out.reshape(bm, n)
    return v * s_ref[row, :]


def _bwd_dx_kernel(s_ref, g_ref, o_ref, x_ref, dx_ref, *, relu: bool,
                   nm_c: int):
    """dx = A·gz − (B·x − D)  (standard BN backward, constants folded).

    Scalar rows: [A, unused, B, −D] (rows 2/3 feed the affine helper).
    """
    g = g_ref[...].astype(jnp.float32)
    if relu:
        g = jnp.where(o_ref[...].astype(jnp.float32) > 0, g, 0.0)
    bx = _affine(s_ref, 1, x_ref[...].astype(jnp.float32), nm_c)  # B·x − D
    dx_ref[...] = (_scale_chan(s_ref, 0, g, nm_c) - bx).astype(dx_ref.dtype)


def _bwd_dx_res_kernel(s_ref, g_ref, o_ref, x_ref, dx_ref, dr_ref, *,
                       relu: bool, nm_c: int):
    g = g_ref[...].astype(jnp.float32)
    if relu:
        g = jnp.where(o_ref[...].astype(jnp.float32) > 0, g, 0.0)
    dr_ref[...] = g.astype(dr_ref.dtype)
    bx = _affine(s_ref, 1, x_ref[...].astype(jnp.float32), nm_c)
    dx_ref[...] = (_scale_chan(s_ref, 0, g, nm_c) - bx).astype(dx_ref.dtype)


def _bwd_reduce(g, out, x, mean, r, relu, *, interpret=None):
    interpret = _auto_interpret() if interpret is None else interpret
    c = x.shape[-1]
    mode = _mode(c)
    x2 = _view2d(x, mode)
    m, lanes = x2.shape
    nm_c = c if mode == "nmin" else 0
    bm = _pick_bm(m, lanes, nm_c or 1)
    scal = jnp.stack([
        r.astype(jnp.float32), (-mean * r).astype(jnp.float32)
    ])
    blk = pl.BlockSpec((bm, lanes), lambda i: (i, 0))
    sums = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, relu=relu, nm_c=nm_c),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((2, c), lambda i: (0, 0))] + [blk] * 3,
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM
        ),
        interpret=interpret,
    )(scal, _view2d(g, mode), _view2d(out, mode), x2)
    return sums[0], sums[1]  # (Σ gz, Σ gz·x̂)


def _bwd_dx(g, out, x, coefs, relu, want_dres, *, interpret=None):
    interpret = _auto_interpret() if interpret is None else interpret
    c = x.shape[-1]
    mode = _mode(c)
    a, b, d = coefs
    scal = jnp.stack([
        a.astype(jnp.float32), jnp.zeros_like(a, dtype=jnp.float32),
        b.astype(jnp.float32), (-d).astype(jnp.float32),
    ])
    arrays = [_view2d(t, mode) for t in (g, out, x)]
    nm_c = c if mode == "nmin" else 0
    if want_dres:
        dx, dr = _elem_call(
            functools.partial(_bwd_dx_res_kernel, relu=relu), scal, arrays,
            [g.dtype, g.dtype], nm_c, interpret=interpret,
        )
        return _unview2d(dx, x.shape, mode), _unview2d(dr, x.shape, mode)
    dx = _elem_call(
        functools.partial(_bwd_dx_kernel, relu=relu), scal, arrays,
        g.dtype, nm_c, interpret=interpret,
    )
    return _unview2d(dx, x.shape, mode), None


# ----------------------------------------------------- differentiable stats
@jax.custom_vjp
def bn_stats_diff(x):
    """Differentiable Pallas batch stats — the surgical fwd-only variant.

    MEASURED NET LOSS e2e (480 vs 509 img/s, module docstring): stripping
    the stat epilogue did not speed the convs enough to pay for the extra
    full read of x this kernel adds. Retained as the experiment record.
    (The "~25-30 ms/step of conv-epilogue slack" estimate that motivated
    this variant came from the 4x-inflated profile reading described in
    the module docstring; per-iter the conv+stats fusions run ~1.3-1.6x
    over their conv floors — too little to pay for an added full pass.)

    The VJP is pure jnp — d/dx of (mean, var) is a per-channel affine of x,
    ``(dmean − 2·mean·dvar)/M + x·(2·dvar/M)`` — so XLA fuses the backward
    into its existing (conv-read-fused) BN backward chain: the bwd graph is
    IDENTICAL in structure to unfused flax BN. Full-kernel BN
    (fused_bn_act) measured SLOWER e2e (379 vs 251 ms/step) precisely
    because it replaced that fused backward; this keeps it.
    """
    mean, var = bn_stats(x)
    return mean, var


def _bn_stats_diff_fwd(x):
    mean, var = bn_stats(x)
    return (mean, var), (x, mean)


def _bn_stats_diff_bwd(saved, cts):
    x, mean = saved
    dmean, dvar = cts
    m = x.shape[0] * x.shape[1] * x.shape[2]
    base = (dmean - 2.0 * mean * dvar) / m
    slope = 2.0 * dvar / m
    dx = (base + x.astype(jnp.float32) * slope).astype(x.dtype)
    return (dx,)


bn_stats_diff.defvjp(_bn_stats_diff_fwd, _bn_stats_diff_bwd)


# ------------------------------------------------------------- custom_vjp op
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _bn_act(x, scale, bias, residual, relu):
    primal, _ = _bn_act_vjp_fwd(x, scale, bias, residual, relu)
    return primal


def _bn_act_vjp_fwd(x, scale, bias, residual, relu):
    mean, var = bn_stats(x)
    r = jax.lax.rsqrt(var + _EPS)
    mul = r * scale
    add = bias - mean * mul
    out = bn_normalize(x, mul, add, residual, relu)
    saved = (x, out, mean, r, scale, residual is not None)
    return (out, mean, var), saved


def _bn_act_bwd(relu, saved, cts):
    # cts[1]/cts[2] (mean/var cotangents) are zero by construction: the
    # running-stat update is aux, outside the differentiated loss (flax
    # semantics — torch's running stats carry no grad either).
    g_out = cts[0]
    x, out, mean, r, scale, has_res = saved
    m_rows = x.shape[0] * x.shape[1] * x.shape[2]
    dbias, dscale = _bwd_reduce(g_out, out, x, mean, r, relu)
    mul = r * scale
    # dx = mul·(gz − Σgz/M − x̂·Σgz·x̂/M)  expanded to  A·gz − B·x + D
    a = mul
    b = mul * r * dscale / m_rows
    d = mean * b - mul * dbias / m_rows
    dx, dres = _bwd_dx(g_out, out, x, (a, b, d), relu, has_res)
    return (dx, dscale, dbias, dres)


_bn_act.defvjp(_bn_act_vjp_fwd, _bn_act_bwd)


def fused_bn_act(x, scale, bias, residual=None, relu=True):
    """Train-mode BN(+residual)+ReLU over NHWC ``x``; returns (out, mean, var).

    ``mean``/``var`` are the f32 batch statistics for the running-average
    update; gradients do not flow through them (flax semantics — the
    running-stat update is outside the differentiated graph).
    """
    return _bn_act(x, scale, bias, residual, relu)
