"""EXPERIMENT: fused int8 bottleneck kernel vs XLA int8, per stage shape.

Chains IDENTITY blocks (the kernel's domain) back-to-back like the engine
does and measures device ms/block for
  a) XLA int8 convs (s32 accumulators materialize to HBM — the profile shows
     conv3's s32 at layer1 costs ~6 ms/iter @b256 just to requantize),
  b) the Pallas fused kernel at several tile sizes.

Run: python experiments/int8_block_bench.py --stage 1 [--batch 256]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_yolo_tpu")

from yolo_tpu.serving.engine import _block_xla  # noqa: E402
from yolo_tpu.serving.pallas_int8 import block_pallas  # noqa: E402
from yolo_tpu.utils.timing import device_time_ms  # noqa: E402

STAGES = {
    1: (112, 256, 64),
    2: (56, 512, 128),
    3: (28, 1024, 256),
    4: (14, 2048, 512),
}


def make_qblock(key, C, P):
    ks = jax.random.split(key, 9)
    ri8 = lambda k, s: jax.random.randint(k, s, -127, 128, jnp.int8)  # noqa
    ru = lambda k, s, lo, hi: jax.random.uniform(k, s, jnp.float32, lo, hi)  # noqa
    return {
        "conv1": {"wq": ri8(ks[0], (1, 1, C, P)),
                  "m": ru(ks[1], (P,), 1e-4, 3e-4), "t": ru(ks[2], (P,), -2, 2)},
        "conv2": {"wq": ri8(ks[3], (3, 3, P, P)),
                  "m": ru(ks[4], (P,), 1e-5, 3e-5), "t": ru(ks[5], (P,), -2, 2)},
        "conv3": {"wq": ri8(ks[6], (1, 1, P, C)),
                  "m": ru(ks[7], (C,), 1e-4, 3e-4), "t": ru(ks[8], (C,), -2, 2)},
        "downsample": None,
        "rx": jnp.float32(0.9),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--tiles", default=None,
                    help="comma list of tile_rows to try (default: auto set)")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--chain", action="store_true",
                    help="bench the whole-image chain kernel instead")
    ap.add_argument("--with-ds", action="store_true")
    args = ap.parse_args()

    if args.chain:
        bench_chain(args.stage, args.batch, args.blocks, args.with_ds)
        return

    H, C, P = STAGES[args.stage]
    b = args.batch
    qbs = [make_qblock(jax.random.PRNGKey(i), C, P) for i in range(args.blocks)]
    x = jax.random.randint(jax.random.PRNGKey(99), (b, H, H, C), -127, 128,
                           jnp.int8)
    jax.block_until_ready(x)

    if not args.skip_xla:
        @jax.jit
        def chain_xla(x):
            for qb in qbs:
                x = _block_xla(x, qb, stride=1)
            return x

        t = device_time_ms(chain_xla, x, iters=4, tag=f"xla_s{args.stage}")
        print(f"stage{args.stage} b{b} XLA int8: {t / args.blocks:.2f} ms/block")

    if args.tiles:
        tiles = [int(t) for t in args.tiles.split(",")]
    else:
        tiles = {1: [28, 56], 2: [28, 56], 3: [14, 28], 4: [7, 14]}[args.stage]
    pad = H % 8 != 0
    if pad:
        wp = (H + 31) // 32 * 32
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wp - H), (0, 0)))
    for tr in tiles:
        if H % tr or tr + 2 > H:
            continue

        @functools.partial(jax.jit, static_argnames=())
        def chain_pl(x, tr=tr):
            for qb in qbs:
                x = block_pallas(x, qb, tile_rows=tr,
                                 real_w=H if pad else None)
            return x

        try:
            t = device_time_ms(chain_pl, xp if pad else x, iters=4,
                               tag=f"pl_s{args.stage}_t{tr}")
            print(f"stage{args.stage} b{b} Pallas TH={tr}: "
                  f"{t / args.blocks:.2f} ms/block")
        except Exception as exc:
            print(f"stage{args.stage} TH={tr} FAILED: {type(exc).__name__}")


def bench_chain(stage, batch, blocks, with_ds=False):
    """Whole-image chain kernel vs the same chain in XLA blocks."""
    from yolo_tpu.serving.pallas_int8 import chain_pallas

    H, C, P = STAGES[stage]
    qbs = [make_qblock(jax.random.PRNGKey(i), C, P) for i in range(blocks)]
    if with_ds:
        k = jax.random.split(jax.random.PRNGKey(77), 3)
        qbs[0]["downsample"] = {
            "wq": jax.random.randint(k[0], (1, 1, C, C), -127, 128, jnp.int8),
            "m": jax.random.uniform(k[1], (C,), jnp.float32, 1e-4, 3e-4),
            "t": jax.random.uniform(k[2], (C,), jnp.float32, -2, 2),
        }
        qbs[0]["rx"] = None
    x = jax.random.randint(jax.random.PRNGKey(99), (batch, H, H, C), -127,
                           128, jnp.int8)
    jax.block_until_ready(x)
    pad = H % 8 != 0
    xp = x
    if pad:
        wp = (H + 31) // 32 * 32
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wp - H), (0, 0)))

    fn = jax.jit(lambda v: chain_pallas(v, qbs, real_w=H if pad else None))
    t = device_time_ms(fn, xp, iters=4, tag=f"chain_s{stage}")
    print(f"stage{stage} b{batch} CHAIN({blocks}blk{'+ds' if with_ds else ''}):"
          f" {t / blocks:.2f} ms/block ({t:.2f} total)")


if __name__ == "__main__":
    main()
