#!/usr/bin/env python
"""Per-op roofline ledger for the int8 serving engine: measured vs floors.

Joins a jax.profiler device trace with the compiled HLO module to produce,
for every op above a time threshold, the measured device time alongside its
two lower bounds:

  mem floor      = bytes touched (operands + result, real dtype widths)
                   / 819 GB/s HBM peak
  compute floor  = conv/dot MACs x 2 (summed over every convolution nested
                   anywhere in the fusion) / 394 TOPS int8 (197 bf16/f32)

and the ratios against ``max(floors)`` (the perfect-overlap oracle) and
``mem + compute`` (the serial-execution model). The v5e measurements sit
near the SERIAL sum on the fused conv+epilogue ops — neither XLA's fusion
emitter nor Mosaic (which serializes VPU and MXU work, PARITY.md Winograd
bullet) overlaps DMA/MXU/VPU phases at these geometries — so the honest
per-op target is the serial column, and "compiler-bound" means measured
is within ~1.1x of it while no alternative expression (PARITY.md
Performance table; experiments/*.py) has demonstrated a better rate.

Usage:
    python tools/op_ledger.py [--batch 256] [--min-ms 0.1] [--bf16]

``--bf16`` ledgers the exact-parity bf16 graph (YOLOInference) instead of the
int8 serving engine, with compute floors at the 197-TOPS bf16 rate.
``ledger_for_fn`` is the library entry point bench.py uses to emit
``vs_serial_bound`` next to the headline number.
"""

from __future__ import annotations

import argparse
import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

HBM_GBPS = 819.0
TOPS_INT8 = 394.0
TOPS_F32 = 197.0

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples by summing)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


class HloModule:
    """Light-weight text index of an optimized HLO module."""

    def __init__(self, text: str):
        self.defs: dict[str, str] = {}
        self.computations: dict[str, list[str]] = {}
        cur = None
        for line in text.splitlines():
            if line.rstrip().endswith("{") and "%" in line:
                name = line.split("%", 1)[1].split(" ", 1)[0]
                cur = name
                self.computations[cur] = []
                continue
            if line.startswith("}"):
                cur = None
                continue
            m = re.match(r"\s+(?:ROOT )?%([\w.\-]+) = (.*)", line)
            if m:
                # Strip layout annotations ({0,3,2,1:T(8,128)(4,1)} etc.):
                # their parentheses confuse the operand-list parsing.
                self.defs[m.group(1)] = re.sub(r"\{[^{}]*\}", "", m.group(2))
                if cur is not None:
                    self.computations[cur].append(m.group(1))

    def op_line(self, name: str) -> str:
        return self.defs.get(name, "")

    def fusion_called(self, name: str) -> str | None:
        m = re.search(r"calls=%([\w.\-]+)", self.op_line(name))
        return m.group(1) if m else None

    def conv_flops(self, comp: str, seen=None) -> float:
        """Sum MACs*2 over every convolution in ``comp``, recursing into
        nested fusions (XLA nests whole convs inside dot-epilogue fusions)."""
        seen = seen if seen is not None else set()
        if comp in seen:
            return 0.0
        seen.add(comp)
        flops = 0.0
        for op in self.computations.get(comp, []):
            line = self.defs[op]
            if " convolution(" in line:
                out_m = _SHAPE_RE.search(line)
                ops_m = re.search(r"convolution\(%([\w.\-]+), %([\w.\-]+)\)",
                                  line)
                if not (out_m and ops_m):
                    continue
                out_elems = 1
                for d in out_m.group(2).split(","):
                    if d:
                        out_elems *= int(d)
                k_line = self.defs.get(ops_m.group(2), "")
                k_m = _SHAPE_RE.search(k_line)
                if not k_m:
                    continue
                k_dims = [int(d) for d in k_m.group(2).split(",") if d]
                k_elems = 1
                for d in k_dims:
                    k_elems *= d
                dl = re.search(r"dim_labels=\w+_(\w+)->(\w+)", line)
                if not (dl and k_dims):
                    continue
                o_dim = k_dims[dl.group(1).index("o")]
                if dl.group(2).startswith("f"):
                    # Operand-swapped dot encoding (…_o01i->f01b with
                    # rhs_reversal + full padding): the kernel is the
                    # activation and the contraction size is the o-dim.
                    flops += out_elems * o_dim * 2
                else:
                    flops += out_elems * (k_elems / max(o_dim, 1)) * 2
            elif " fusion(" in line:
                called = re.search(r"calls=%([\w.\-]+)", line)
                if called:
                    flops += self.conv_flops(called.group(1), seen)
        return flops

    def op_bounds(self, name: str) -> tuple[float, float, str]:
        """(bytes, flops, kind) for a top-level op."""
        line = self.op_line(name)
        if not line:
            return 0.0, 0.0, "?"
        result_bytes = _shape_bytes(line.split(" ", 1)[0])
        opnds = re.search(r"\w+\(([^)]*)\)", line)
        in_bytes = 0
        if opnds:
            for ref in re.findall(r"%([\w.\-]+)", opnds.group(1)):
                d = self.defs.get(ref, "")
                if d:
                    in_bytes += _shape_bytes(d.split(" ", 1)[0])
        flops = 0.0
        head = line.split("(")[0].split()
        kind = head[-1] if head else "?"
        called = self.fusion_called(name)
        if called:
            flops = self.conv_flops(called)
            kind = "fusion"
        elif " convolution(" in line:
            # top-level conv: reuse the same math via a fake computation
            self.computations["__tmp__"] = [name]
            flops = self.conv_flops("__tmp__", set())
            kind = "conv"
        return float(in_bytes + result_bytes), flops, kind


def ledger_for_fn(fn, args, iters: int = 4, min_ms: float = 0.10,
                  tops: float = TOPS_INT8, trace_dir: str | None = None,
                  compiler_options=None):
    """Trace an already-compiled jitted call and return the roofline ledger.

    Args:
        fn: jitted callable (already warm — caller must have run it once).
        args: positional args tuple for ``fn``.
        iters: steady-state executions to average device time over.
        min_ms: ops below this per-iter time are pooled, not ledgered.
        tops: MXU compute rate for the compute floor (394 int8, 197 bf16).
        compiler_options: XLA options for the HLO-text compile; defaults to
            the production set (``utils.platform.tpu_compiler_options``) so
            the floors come from the SAME graph the traced executions run —
            the jit-level options don't automatically reach an explicit
            ``fn.lower().compile()``.

    Returns a dict: rows (per-op tuples), total_ms, ledgered_ms, serial_ms,
    overlap_ms, vs_serial, vs_overlap.
    """
    import jax

    from tools.profile_layers import collect_events
    from yolo_tpu.utils.platform import tpu_compiler_options

    if compiler_options is None:
        compiler_options = tpu_compiler_options() or None
    hlo = HloModule(
        fn.lower(*args).compile(compiler_options=compiler_options).as_text()
    )
    trace_dir = trace_dir or "/tmp/yolo_tpu_op_ledger"
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
            jax.block_until_ready(out)
    events = collect_events(trace_dir)

    per_op = collections.Counter()
    for e in events:
        name = e.get("name", "")
        if name.startswith("jit") or name.isdigit():
            continue
        per_op[name] += e["dur"]

    total_ms = sum(per_op.values()) / iters / 1e3
    rows, small_ms = [], 0.0
    for name, dur in per_op.most_common():
        ms = dur / iters / 1e3
        if ms < min_ms:
            small_ms += ms
            continue
        nbytes, flops, kind = hlo.op_bounds(name)
        mem = nbytes / (HBM_GBPS * 1e9) * 1e3
        cmp_ = flops / (tops * 1e12) * 1e3
        rows.append((name, ms, nbytes / 1e9, flops / 1e9, mem, cmp_, kind))

    agg_serial = sum(mem + cmp_ for _, _, _, _, mem, cmp_, _ in rows)
    agg_max = sum(max(mem, cmp_) for _, _, _, _, mem, cmp_, _ in rows)
    ledgered = total_ms - small_ms
    return {
        "rows": rows,
        "small_ms": small_ms,
        "total_ms": total_ms,
        "ledgered_ms": ledgered,
        "serial_ms": agg_serial,
        "overlap_ms": agg_max,
        "vs_serial": ledgered / max(agg_serial, 1e-9),
        "vs_overlap": ledgered / max(agg_max, 1e-9),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--min-ms", type=float, default=0.10)
    ap.add_argument("--stem", choices=["pallas", "xla"], default="pallas",
                    help="pallas = the shipped config (stem front kernel); "
                         "xla = pure-XLA stem (quant fusion + 2 copies)")
    ap.add_argument("--bf16", action="store_true",
                    help="ledger the exact-parity bf16 graph (YOLOInference) "
                         "with 197-TOPS compute floors instead of the int8 "
                         "engine")
    args = ap.parse_args()

    from yolo_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    from yolo_tpu.utils.platform import machine_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_cache_yolo_tpu")
    )
    from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model

    model = YOLOv1(
        num_classes=20, S=7, B=2,
        backbone=ResNetBackbone(dtype=jnp.bfloat16,
                                quantized=not args.bf16),
        dtype=jnp.bfloat16,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=448)
    imgs = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, 448, 448, 3), jnp.bfloat16
    )
    if args.bf16:
        from yolo_tpu.inference import YOLOInference

        engine = YOLOInference(model, variables)
        fn = engine._predict_arrays  # the jitted graph under predict_batch_arrays
        fn_args = (variables, imgs, 0.25, 0.4)
        tops = TOPS_F32
    else:
        from yolo_tpu.serving import build_int8_predict
        from yolo_tpu.serving.engine import default_impl

        impl = default_impl() if args.stem == "pallas" else {}
        predict, q = build_int8_predict(model, variables, [imgs[:64]], impl=impl)
        fn = predict
        fn_args = (q, imgs, 0.25, 0.4)
        tops = TOPS_INT8

    out = fn(*fn_args)
    jax.block_until_ready(out)
    from yolo_tpu.utils.platform import tpu_compiler_options

    led = ledger_for_fn(
        fn, fn_args, iters=args.iters, min_ms=args.min_ms, tops=tops,
        # Match the HLO compile to the per-graph production options the
        # traced jit itself carries (int8: 64 MiB scoped VMEM; bf16: 96).
        compiler_options=tpu_compiler_options(
            "bf16" if args.bf16 else "int8") or None,
    )

    print(f"batch {args.batch}: module ~{led['total_ms']:.2f} ms/iter "
          f"({args.batch / led['total_ms'] * 1e3:.0f} img/s)"
          + (" [bf16 graph, 197-TOPS floors]" if args.bf16 else ""))
    print(f"{'op':<28}{'ms':>8}{'GB':>7}{'GOP':>8}{'mem':>7}{'cmp':>7}"
          f"{'serial':>8}{'x/max':>7}{'x/ser':>7}")
    for name, ms, gb, gop, mem, cmp_, kind in led["rows"]:
        serial = mem + cmp_
        mx = max(mem, cmp_)
        # Sub-us floors (decode/NMS scan steps, scalar control ops) produce
        # meaningless ratios; their absolute times are the signal.
        rmax = f"{ms / mx:>7.2f}" if mx > 1e-3 else "      -"
        rser = f"{ms / serial:>7.2f}" if serial > 1e-3 else "      -"
        print(f"{name:<28}{ms:>8.3f}{gb:>7.2f}{gop:>8.0f}{mem:>7.3f}"
              f"{cmp_:>7.3f}{serial:>8.3f}{rmax}{rser}")
    print(f"{'(ops below threshold)':<28}{led['small_ms']:>8.3f}")
    print(f"ledgered {led['ledgered_ms']:.2f} ms: serial-model bound "
          f"{led['serial_ms']:.2f} ms ({led['vs_serial']:.2f}x), "
          f"perfect-overlap bound {led['overlap_ms']:.2f} ms "
          f"({led['vs_overlap']:.2f}x)")


if __name__ == "__main__":
    main()
