"""EXPERIMENT: Pallas fused identity-bottleneck (inference, BN pre-folded).

One kernel computes relu(x + conv3(relu(conv2(relu(conv1(x)))))) with all
intermediates VMEM-resident. Tile = (TH rows, full W); the 3x3 halo comes
from a fixed-size DMA of TH+2 input rows with a clamped start, re-aligned by
a three-way (top/middle/bottom) static-shift branch.

MEASURED RESULT (v5e-1, layer1 shapes: 112x112, 256ch/64 planes, b64,
2026-08): numerically correct (rel diff ~0.3%, bf16 ordering noise) but
SLOWER than in-model XLA — 4.3 ms/block vs XLA's 2.96 ms/block in a chained
3-block jit (a standalone XLA reference measures 25.9 ms, a layout artifact;
always benchmark against chained/in-model XLA). Why XLA wins here: layer1's
64-plane dots use at most half the MXU's 128 lanes and the kernel's DMA is
not double-buffered, while XLA's conv tiling + fusion already runs these
bandwidth-bound shapes near the HBM roofline. To revisit: im2col single-dot
conv2 (K=576), double-buffered halo DMA, and int8-resident activations
(which would also halve HBM bytes) — see PARITY.md "Known gaps".

Run: python experiments/fused_block_pallas.py [--interpret]
"""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")


def fused_bottleneck_kernel(
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
    xt, y1p, sem,
    *, TH, H, W, CIN, P,
):
    n = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    row0 = i * TH
    # Copied window start, clamped fully inside the image (size TH+2 static).
    s = jnp.clip(row0 - 1, 0, H - (TH + 2))

    cp = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(s, TH + 2), :, :], xt, sem
    )
    cp.start()
    cp.wait()

    # conv1 (1x1) + relu on the copied rows.
    xf = xt[...].reshape((TH + 2) * W, CIN)
    y1 = (
        jax.nn.relu(
            jnp.dot(xf, w1_ref[...], preferred_element_type=jnp.float32)
            + b1_ref[...]
        )
        .astype(jnp.bfloat16)
        .reshape(TH + 2, W, P)
    )

    # Re-align copied rows to the logical halo window (zero rows off-image):
    # logical row r = copied row r+d, d = row0-1-s in {-1 (top), 0, +1 (bot)}.
    y1p[...] = jnp.zeros_like(y1p)
    is_top = i == 0
    is_bot = i == n_tiles - 1

    @pl.when(is_top)
    def _():  # d = -1: logical rows 1..TH+1 <- copied rows 0..TH
        y1p[pl.ds(1, TH + 1), pl.ds(1, W), :] = y1[0 : TH + 1]

    @pl.when(is_bot & ~is_top)
    def _():  # d = +1: logical rows 0..TH <- copied rows 1..TH+1
        y1p[pl.ds(0, TH + 1), pl.ds(1, W), :] = y1[1 : TH + 2]

    @pl.when(~is_top & ~is_bot)
    def _():  # d = 0
        y1p[:, pl.ds(1, W), :] = y1

    # conv2 (3x3) as 9 shifted dots over the padded logical window.
    acc = jnp.zeros((TH * W, P), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = y1p[pl.ds(dy, TH), pl.ds(dx, W), :].reshape(TH * W, P)
            acc += jnp.dot(sl, w2_ref[dy, dx], preferred_element_type=jnp.float32)
    y2 = jax.nn.relu(acc + b2_ref[...]).astype(jnp.bfloat16)

    # conv3 (1x1) + residual + relu.
    y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32) + b3_ref[...]
    d_plus_1 = row0 - s  # in {0, 1, 2}
    res = xt[pl.ds(d_plus_1, TH), :, :].reshape(TH * W, CIN).astype(jnp.float32)
    out_ref[...] = (
        jax.nn.relu(y3 + res).astype(jnp.bfloat16).reshape(1, TH, W, CIN)
    )


@functools.partial(jax.jit, static_argnames=("TH", "interpret"))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, TH=16, interpret=False):
    N, H, W, CIN = x.shape
    P = w1.shape[1]
    kern = functools.partial(
        fused_bottleneck_kernel, TH=TH, H=H, W=W, CIN=CIN, P=P
    )
    grid = (N, H // TH)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, CIN), lambda n, i: (n, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, H, W, CIN), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W, CIN), jnp.bfloat16),
            pltpu.VMEM((TH + 2, W + 2, P), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)


def reference(x, w1, b1, w2, b2, w3, b3):
    from jax import lax
    y = jax.nn.relu(
        lax.conv_general_dilated(
            x, w1[None, None], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b1
    ).astype(jnp.bfloat16)
    y = jax.nn.relu(
        lax.conv_general_dilated(
            y, w2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b2
    ).astype(jnp.bfloat16)
    y = lax.conv_general_dilated(
        y, w3[None, None], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b3
    return jax.nn.relu(y + x.astype(jnp.float32)).astype(jnp.bfloat16)


if __name__ == "__main__":
    import sys
    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    N, H, W, CIN, P = (2, 48, 112, 256, 64) if interpret else (64, 112, 112, 256, 64)
    x = jnp.asarray(rng.normal(size=(N, H, W, CIN)).astype(np.float32) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(CIN, P)).astype(np.float32) * (2 / CIN) ** 0.5, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(P,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(3, 3, P, P)).astype(np.float32) * (2 / (9 * P)) ** 0.5, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(P,)).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.normal(size=(P, CIN)).astype(np.float32) * (2 / P) ** 0.5, jnp.bfloat16)
    b3 = jnp.asarray(rng.normal(size=(CIN,)).astype(np.float32) * 0.1)

    ref = reference(x, w1, b1, w2, b2, w3, b3)
    got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, TH=16, interpret=interpret)
    diff = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    rel = diff / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
    print("max abs diff:", float(diff), "rel:", float(rel))

    if not interpret:
        import glob, gzip, json
        def device_ms(fn, tag, iters=6):
            out = fn(); jax.block_until_ready(out)
            dtr = f"/tmp/trace_fb_{tag}"
            with jax.profiler.trace(dtr):
                for _ in range(iters):
                    out = fn()
                float(jnp.sum(out[0, 0, 0, :4].astype(jnp.float32)))
            f = sorted(glob.glob(dtr + "/plugins/profile/*/*.trace.json.gz"))[-1]
            with gzip.open(f) as fh: data = json.load(fh)
            evs = data["traceEvents"]
            pids = {e["pid"]: e["args"].get("name", "") for e in evs
                    if e.get("ph") == "M" and e.get("name") == "process_name"}
            tot = sum(e["dur"] for e in evs if e.get("ph") == "X"
                      and "TPU" in pids.get(e.get("pid"), "")
                      and e["name"].startswith("jit"))
            return tot / 1e3 / iters
        mx = device_ms(lambda: reference(x, w1, b1, w2, b2, w3, b3), "xla")
        mp = device_ms(lambda: fused_bottleneck(x, w1, b1, w2, b2, w3, b3, TH=16), "pallas")
        print(f"XLA bottleneck: {mx:.2f} ms | Pallas fused: {mp:.2f} ms | speedup {mx/mp:.2f}x")
