#!/usr/bin/env python
"""Ablation: where does the Pallas Winograd kernel's time go?

Variants (same grid/BlockSpecs as pallas_wino.py at head-conv1 geometry):
  full      — the real kernel
  taps      — tap build + requant only (dots/inverse skipped, dummy out)
  dots      — 16 dots + inverse only (tap build skipped, vq garbage)
  dots-raw  — 16 dots only (no dequant/inverse/epilogue)
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
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--h", type=int, default=14)
    ap.add_argument("--c", type=int, default=1024)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from yolo_tpu.utils.platform import (
        machine_cache_dir,
        respect_jax_platforms_env,
    )

    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )

    from yolo_tpu.serving import winograd as W
    from yolo_tpu.utils.timing import device_time_ms

    IMG, H, C, K = args.chunk, args.h, args.c, args.k
    n = args.batch
    T = H // 2
    TW = T + 1
    M1 = T * TW
    A_T, B_T = W.A_T, W.B_T

    def kernel_variant(dinv_ref, x_ref, u_ref, mw_ref, b_ref, out_ref,
                       xp_ref, vq_ref, y_ref, *, mode: str):
        WP = 2 * TW + 2
        a2 = np.einsum("ra,sb->rsab", A_T, A_T).reshape(4, 16)
        if mode in ("full", "taps"):
            xp_ref[:, 0, :, :] = jnp.zeros((IMG, WP, C), jnp.int8)
            xp_ref[:, H + 1, :, :] = jnp.zeros((IMG, WP, C), jnp.int8)
            xp_ref[:, 1:H + 1, 0, :] = jnp.zeros((IMG, H, C), jnp.int8)
            for w in range(H + 1, WP):
                xp_ref[:, 1:H + 1, w, :] = jnp.zeros((IMG, H, C), jnp.int8)
            xp_ref[:, 1:H + 1, 1:H + 1, :] = x_ref[:, :, :, :]
            xp = xp_ref[:, :, :, :]
            xp2 = xp.reshape(IMG, T + 1, 2, WP // 2, 2 * C)
            e = [[None] * 4 for _ in range(4)]
            for u in range(4):
                du, pu = u // 2, u % 2
                for v in range(4):
                    dv, pv = v // 2, v % 2
                    e[u][v] = xp2[:, du:du + T, pu, dv:dv + TW,
                                  pv * C:(pv + 1) * C].astype(jnp.int32)
            for a in range(4):
                rows = []
                for v in range(4):
                    acc = None
                    for u in range(4):
                        cu = int(B_T[a, u])
                        if cu == 0:
                            continue
                        term = e[u][v] if cu > 0 else -e[u][v]
                        acc = term if acc is None else acc + term
                    rows.append(acc)
                for b in range(4):
                    acc = None
                    for v in range(4):
                        cv = int(B_T[b, v])
                        if cv == 0:
                            continue
                        term = rows[v] if cv > 0 else -rows[v]
                        acc = term if acc is None else acc + term
                    t_idx = a * 4 + b
                    vq = jnp.clip(
                        jnp.round(acc.astype(jnp.float32) * dinv_ref[t_idx]),
                        -127.0, 127.0).astype(jnp.int8)
                    vq_ref[t_idx, :, :] = vq.reshape(IMG * M1, C)
        if mode in ("full", "dots", "dots-raw"):
            first = [True] * 4
            for t in range(16):
                acc = jax.lax.dot_general(
                    vq_ref[t, :, :], u_ref[t, :, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if mode == "dots-raw":
                    y_ref[t % 4, :, :] = acc.astype(jnp.float32)
                    continue
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
        if mode == "taps":
            y_ref[0, :, :] = vq_ref[0, :, :].astype(jnp.float32)
            for p in range(4):
                r, s_ = p // 2, p % 2
                out_ref[:, :, r, :, s_ * K:(s_ + 1) * K] = (
                    vq_ref[p, :, :K].reshape(IMG, T, TW, K)[:, :, :T, :])
            return
        for p in range(4):
            r, s_ = p // 2, p % 2
            y = y_ref[p, :, :] + b_ref[0, :]
            y = jnp.where(y > 0, y, 0.1 * y)
            yq = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
            yq = yq.reshape(IMG, T, TW, K)
            out_ref[:, :, r, :, s_ * K:(s_ + 1) * K] = yq[:, :, :T, :]

    rng = np.random.default_rng(0)
    x_q = jnp.asarray(rng.integers(-127, 128, (n, H, H, C)), jnp.int8)
    uq = jnp.asarray(rng.integers(-127, 128, (16, C, K)), jnp.int8)
    mw = jnp.asarray(rng.normal(size=(16, 1, K)) * 1e-4, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, K)), jnp.float32)
    dinv = jnp.asarray(np.full(16, 0.01), jnp.float32)

    def make(mode):
        @jax.jit
        def fn(x_q):
            return pl.pallas_call(
                functools.partial(kernel_variant, mode=mode),
                grid=(n // IMG,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((IMG, H, H, C), lambda g: (g, 0, 0, 0)),
                    pl.BlockSpec((16, C, K), lambda g: (0, 0, 0)),
                    pl.BlockSpec((16, 1, K), lambda g: (0, 0, 0)),
                    pl.BlockSpec((1, K), lambda g: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (IMG, T, 2, T, 2 * K), lambda g: (g, 0, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((n, T, 2, T, 2 * K), jnp.int8),
                scratch_shapes=[
                    pltpu.VMEM((IMG, H + 2, 2 * TW + 2, C), jnp.int8),
                    pltpu.VMEM((16, IMG * M1, C), jnp.int8),
                    pltpu.VMEM((4, IMG * M1, K), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(dinv, x_q, uq, mw, bias)
        return fn

    macs = 2 * n * H * H * 9 * C * K
    for mode in ("full", "taps", "dots", "dots-raw"):
        fn = make(mode)
        try:
            t = device_time_ms(fn, x_q, iters=args.iters, tag=f"abl_{mode}")
            print(f"{mode:9s} {t:7.3f} ms  (wino-TOPS {macs/2.25/t/1e9:6.1f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:9s} FAILED: {str(e).splitlines()[0][:160]}",
                  flush=True)

    # MXU-geometry sweep: one dot (M, C) x (C, K) at the kernel's M.
    for mult in (1, 4, 16):
        M = IMG * M1 * mult
        a = jnp.asarray(rng.integers(-127, 128, (M, C)), jnp.int8)
        bq = jnp.asarray(rng.integers(-127, 128, (C, K)), jnp.int8)
        dot = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        t = device_time_ms(dot, a, bq, iters=20, tag=f"dot_M{M}")
        print(f"dot M={M:<6d} {t:7.4f} ms ({2*M*C*K/t/1e9:6.1f} TOPS)",
              flush=True)


if __name__ == "__main__":
    main()
