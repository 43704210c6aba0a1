"""Post-training int8 quantization for the serving pipeline.

Recipe (standard TPU/infra PTQ):
- Weights: symmetric per-output-channel scales, ``s_w = max|w| / 127``.
- Activations: symmetric per-tensor scales calibrated by running the folded
  fp32 forward over sample batches and recording max|activation| at every
  quantization point (``ACT_POINTS``/``act_points``).
- Each conv layer then reduces to: int8 conv -> int32 accumulator ->
  ``y = acc * m + t`` (per-channel f32 fma) -> relu/leaky -> round -> int8,
  where ``m = s_in * s_w / s_out`` and ``t = b / s_out``. Activations stay
  int8 from the input image to the head's last conv — no per-layer
  quantize/dequantize passes (the failure mode PARITY.md documents for the
  naive XLA int8 attempt).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from yolo_tpu.serving.fold import folded_forward

# Flagship activation quantization points (ResNet50 [3,4,6,3] + 4 head convs).
# Transition blocks (block 0 of every stage) add a ``_ds`` point: the
# downsample branch is quantized at its own scale (see quantize_folded).
ACT_POINTS: List[str] = (
    ["input", "stem"]
    + [
        f"l{s + 1}b{b}_{p}"
        for s, n in enumerate((3, 4, 6, 3))
        for b in range(n)
        for p in (("y1", "y2", "ds", "out") if b == 0 else ("y1", "y2", "out"))
    ]
    + [f"head_conv{i}" for i in (1, 2, 3, 4)]
)


def act_points(folded: Dict) -> List[str]:
    """Quantization-point names for an arbitrary folded struct."""
    pts = ["input", "stem"]
    for si, blocks in enumerate(folded["layers"]):
        for bi, blk in enumerate(blocks):
            names = ("y1", "y2", "ds", "out") if blk["downsample"] is not None \
                else ("y1", "y2", "out")
            pts += [f"l{si + 1}b{bi}_{p}" for p in names]
    pts += [f"head_conv{i}" for i in (1, 2, 3, 4)]
    return pts


def calibrate_activations(
    folded: Dict, sample_batches, dtype=jnp.float32, wino_points=()
) -> Dict[str, float]:
    """Run the folded forward over batches; return max|act| per point.

    ``wino_points`` additionally records (16,) per-tap Winograd input
    maxima under ``{name}_wtap`` keys (serving/winograd.py)."""
    import numpy as np

    @jax.jit
    def _stats(params, images):
        stats: Dict = {}
        folded_forward(params, images, dtype=dtype, stats=stats,
                       wino_points=tuple(wino_points))
        return stats

    maxes: Dict[str, float] = {}
    for batch in sample_batches:
        out = jax.device_get(_stats(folded, batch))
        for k, v in out.items():
            v = np.asarray(v)
            if v.ndim == 0:
                maxes[k] = max(maxes.get(k, 0.0), float(v))
            else:  # vector-valued (per-tap) maxima
                maxes[k] = np.maximum(maxes.get(k, 0.0), v)
    return maxes


def _quant_weight(w):
    """Per-output-channel symmetric int8. w: (..., Cout) -> (w_q, s_w)."""
    w = w.astype(jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=reduce_axes) / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return w_q, s_w


def _layer(w, b, s_in: float, s_out: float):
    w_q, s_w = _quant_weight(w)
    return {
        "wq": w_q,
        "m": (s_in * s_w / s_out).astype(jnp.float32),
        "t": (b.astype(jnp.float32) / s_out),
    }


def s2d_stem_weights(w):
    """7x7/s2 stem kernel -> its space-to-depth-2 equivalent (4x4/s1, 12ch).

    With the input rearranged X[I,J,(p,q,c)] = x[2I+p, 2J+q, c], the stride-2
    7x7 conv becomes a stride-1 4x4 conv over 12 channels whose taps are
    W'[A,B,(p*2+q)*3+c,f] = w[2A+p-1, 2B+q-1, c, f] (zero where the source
    index falls outside [0,7)) with asymmetric padding (2,1) — the MLPerf
    ResNet trick, exact to the multiply-add set. It exists because XLA's
    C=3 int8 conv is slower than bf16 (experiments/int8_microbench.py) while
    the 12-channel form quantizes and tiles cleanly.
    """
    C_in, C_out = w.shape[2], w.shape[3]
    w2 = jnp.zeros((4, 4, 4 * C_in, C_out), w.dtype)
    for A in range(4):
        for p in range(2):
            di = 2 * A + p - 1
            if not 0 <= di < 7:
                continue
            for B in range(4):
                for qq in range(2):
                    dj = 2 * B + qq - 1
                    if not 0 <= dj < 7:
                        continue
                    ch = (p * 2 + qq) * C_in
                    w2 = w2.at[A, B, ch : ch + C_in, :].set(w[di, dj])
    return w2


def quantize_folded(
    folded: Dict, act_max: Dict[str, float], stem_mode: str = "s2d",
    fc1_mode: str = "int8", wino=(),
) -> Dict:
    """Folded fp32 params + calibrated activation maxima -> int8 engine params.

    Every activation tensor's scale is ``max/127``; requant multipliers are
    pre-combined so the engine's epilogues are a single per-channel fma.
    ``stem_mode='s2d'`` stores the stem as its space-to-depth 4x4 equivalent
    (bit-identical int8 results; the engine dispatches on the kernel shape).
    ``fc1_mode='int8'`` quantizes fc1 weights per-output-channel so the
    already-int8 head activation dots straight into fc1 (the bf16 path's
    convert+scale pass and half its weight bytes disappear; 'bf16' keeps the
    round-2 formulation).

    ``wino``: names of 3x3/s1 convs ("head_conv1", "l3b1_conv2", ...) that
    additionally get per-tap Winograd F(2,3) params attached under
    ``qc["wino"]`` (serving/winograd.py; requires ``{name}_wtap`` vectors
    in ``act_max`` from ``calibrate_activations(wino_points=...)``).
    """
    if wino:
        from yolo_tpu.serving.winograd import wino_quantize
    s = {k: max(v, 1e-12) / 127.0 for k, v in act_max.items()
         if not k.endswith("_wtap")}

    q: Dict = {"s_img": jnp.float32(s["input"])}
    stem_w = folded["stem"]["w"]
    if stem_mode == "s2d":
        stem_w = s2d_stem_weights(stem_w)
    q["stem"] = _layer(stem_w, folded["stem"]["b"], s["input"], s["stem"])

    layers = []
    s_in = s["stem"]  # carries through blocks and across stage boundaries
    for si, blocks in enumerate(folded["layers"]):
        qblocks = []
        for bi, blk in enumerate(blocks):
            tag = f"l{si + 1}b{bi}"
            qb: Dict = {}
            qb["conv1"] = _layer(blk["conv1"]["w"], blk["conv1"]["b"],
                                 s_in, s[f"{tag}_y1"])
            qb["conv2"] = _layer(blk["conv2"]["w"], blk["conv2"]["b"],
                                 s[f"{tag}_y1"], s[f"{tag}_y2"])
            if f"{tag}_conv2" in wino:
                qb["conv2"]["wino"] = wino_quantize(
                    blk["conv2"]["w"], blk["conv2"]["b"],
                    s[f"{tag}_y1"], s[f"{tag}_y2"],
                    act_max[f"{tag}_conv2_wtap"],
                )
            qb["conv3"] = _layer(blk["conv3"]["w"], blk["conv3"]["b"],
                                 s[f"{tag}_y2"], s[f"{tag}_out"])
            if blk["downsample"] is not None:
                # The branch gets its OWN calibrated scale and lands in int8:
                # at the output scale it can exceed +-127 pre-add (the sum
                # pulls it back), and the round-2 int16-at-output-scale fix
                # cost 2 B/elem of HBM spill on every transition (profiled
                # 2.9 ms at layer1 alone @b256). The epilogue rescales by
                # s_ds/s_out when adding (engine._block_xla).
                s_ds = s[f"{tag}_ds"]
                qb["downsample"] = _layer(
                    blk["downsample"]["w"], blk["downsample"]["b"],
                    s_in, s_ds,
                )
                qb["ds_rescale"] = jnp.float32(s_ds / s[f"{tag}_out"])
                qb["rx"] = None
            else:
                qb["downsample"] = None
                # Residual: x_q * (s_in / s_out), folded into the epilogue.
                qb["rx"] = jnp.float32(s_in / s[f"{tag}_out"])
            s_in = s[f"{tag}_out"]
            qblocks.append(qb)
        layers.append(qblocks)
    q["layers"] = layers

    head = folded["head"]
    qh: Dict = {}
    for i in (1, 2, 3, 4):
        name = f"conv{i}"
        qh[name] = _layer(head[name]["w"], head[name]["b"],
                          s_in, s[f"head_conv{i}"])
        if f"head_conv{i}" in wino:
            qh[name]["wino"] = wino_quantize(
                head[name]["w"], head[name]["b"],
                s_in, s[f"head_conv{i}"], act_max[f"head_conv{i}_wtap"],
            )
        s_in = s[f"head_conv{i}"]
    qh["s_out4"] = jnp.float32(s["head_conv4"])
    if fc1_mode == "int8":
        w1q, s_w1 = _quant_weight(head["fc1"]["w"])
        qh["fc1"] = {
            "wq": w1q,
            "m": (jnp.float32(s_in) * s_w1).astype(jnp.float32),
            "b": head["fc1"]["b"].astype(jnp.float32),
        }
    else:
        qh["fc1"] = {
            "w": head["fc1"]["w"].astype(jnp.bfloat16),
            "b": head["fc1"]["b"].astype(jnp.float32),
        }
    qh["fc2"] = {
        "w": head["fc2"]["w"].astype(jnp.bfloat16),
        "b": head["fc2"]["b"].astype(jnp.float32),
    }
    q["head"] = qh
    return q
