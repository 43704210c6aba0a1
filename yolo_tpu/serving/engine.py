"""The int8-resident serving executor: quantized forward + decode + NMS.

Activations enter as normalized images, are quantized once, and stay int8
through the stem, all 16 bottleneck blocks, and the 4 head convs; every conv
runs int8 x int8 -> int32 on the MXU with a fused per-channel fma epilogue
(see serving/quant.py for the scale algebra). The FC stack runs bf16 and the
standard decode + per-class NMS tail (ops/decode.py, ops/nms.py) is appended
unchanged, so the serving graph has the same output surface as
``YOLOInference._predict_batch``.

Hot stages can be overridden with Pallas kernels (``impl``): the fused
int8 bottleneck kernel in serving/pallas_int8.py keeps a block's y1/y2
intermediates VMEM-resident, which matters on the HBM-bound 112^2/56^2
stages (tools/profile_layers.py: layer1 alone is ~31% of device time at
~8x its compute roofline).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from yolo_tpu.ops.decode import decode_predictions
from yolo_tpu.ops.nms import batched_nms


def _conv_i8(x_q, w_q, stride=1, pad=0):
    return lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _requant(acc_i32, m, t, extra=None, leaky: bool = False):
    """int32 accumulator -> activation -> int8 (output-scale units)."""
    y = acc_i32.astype(jnp.float32) * m + t
    if extra is not None:
        y = y + extra
    y = jnp.where(y > 0, y, 0.1 * y) if leaky else jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _quantize_input(images, s_img):
    x = images.astype(jnp.float32) / s_img
    return jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)


def _normalize_if_uint8(images):
    """Accept raw resized uint8 RGB as the serving wire format.

    Folds ImageNet normalization into the input fusion (same constants and
    op order as the host path, data/transforms.py::normalize), so callers
    can ship 1 byte/pixel over PCIe/network — 4x less than float32 — and
    the engine reads 154 MB instead of 616 MB @b256/448². Float inputs are
    passed through untouched (the parity-pinned path).
    """
    if images.dtype == jnp.uint8:
        from yolo_tpu.data.transforms import device_normalize

        return device_normalize(images)
    return images


def _dot_1x1_i8(x_q, w_q):
    """1x1 conv as a reshaped int8 dot.

    XLA TPU fuses elementwise epilogues into dots but NOT into convolutions:
    the conv form materializes the s32 accumulator to HBM and re-reads it for
    the requant (profiled at ~6 ms/iter for layer1's conv3 alone @b256 —
    4 bytes/elem each way). The dot form keeps the requant in the dot's
    epilogue fusion. Integer math — bit-identical results either way.
    """
    n, h, w, c = x_q.shape
    acc = lax.dot_general(
        x_q.reshape(n * h * w, c), w_q.reshape(w_q.shape[-2:]),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.reshape(n, h, w, -1)


def _conv3x3_retile_rq(x_q, qc, tiles: int):
    """3x3/s1/p1 int8 conv + requant, computed as tiles^2 overlapping VALID
    tiles folded into the batch dim.

    XLA's int8 conv throughput is strongly shape-dependent on v5e: measured
    387 TOPS at 28^2/14^2 with >=128 channels but only 115 TOPS at
    56^2 x 128 (layer2's conv2) — while the SAME math on (4N, 30, 30, 128)
    valid tiles runs at 287 TOPS. Tiling pads the image once, gathers the
    2-pixel-halo tiles (pure integer data movement), convolves valid, and
    requants BEFORE reassembly so the relayout moves int8, not the s32
    accumulator. Bit-identical to the direct conv (same taps, same integer
    accumulation order per output).
    """
    n, h, w, c = x_q.shape
    if h != w or h % tiles != 0:
        raise ValueError(
            f"conv2_tiles={tiles} needs a square feature map divisible by"
            f" the tile count; got {h}x{w}"
        )
    th = h // tiles
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [
        xp[:, i * th : i * th + th + 2, j * th : j * th + th + 2, :]
        for i in range(tiles)
        for j in range(tiles)
    ]
    xt = jnp.concatenate(parts, axis=0)  # (tiles^2 * n, th+2, th+2, c)
    acc = lax.conv_general_dilated(
        xt, qc["wq"], (1, 1), [(0, 0)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = _requant(acc, qc["m"], qc["t"])
    rows = [
        jnp.concatenate([y[(i * tiles + j) * n : (i * tiles + j + 1) * n]
                         for j in range(tiles)], axis=2)
        for i in range(tiles)
    ]
    return jnp.concatenate(rows, axis=1)


def _colpack_weights(wq):
    """(3, 3, C, Cout) stride-2 kernel -> (3, 2, 2C, Cout) superpixel form.

    Column pairs of the input pack into channels (a free bitcast view);
    output col J taps orig cols 2J-1..2J+1 = the odd half of superpixel
    J-1 plus both halves of superpixel J, so the packed kernel is width 2
    with the dx=-1 tap in the left tap's odd-half channels (even half
    zero) — integer accumulation over exact-zero weights is bit-identical
    to the strided conv.
    """
    zero = jnp.zeros_like(wq[:, 0])
    left = jnp.concatenate([zero, wq[:, 0]], axis=1)
    right = jnp.concatenate([wq[:, 1], wq[:, 2]], axis=1)
    return jnp.stack([left, right], axis=1)


def _conv3x3_s2_colpack_rq(y1_q, qc):
    """3x3/s2/p1 int8 conv + requant via column-superpixel packing.

    Re-expresses the W-stride as weight layout so XLA sees a stride-(2,1)
    conv over (N, H, W/2, 2C) — probing whether XLA's slow strided-int8
    shape class (PARITY.md: 2.2-3.5x over compute floors) is the W stride
    specifically. Bit-identical to engine._conv_i8 + _requant.
    """
    n, h, w, c = y1_q.shape
    xp = y1_q.reshape(n, h, w // 2, 2 * c)
    acc = lax.conv_general_dilated(
        xp, _colpack_weights(qc["wq"]), (2, 1), [(1, 1), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return _requant(acc, qc["m"], qc["t"])


def _block_xla(x_q, qb, stride=1, conv2_tiles: int = 0, conv2_fn=None,
               conv2s1_fn=None):
    """One bottleneck block: int8 dots (1x1) + int8 conv (3x3), fused requants."""
    acc = _dot_1x1_i8(x_q, qb["conv1"]["wq"])
    y1 = _requant(acc, qb["conv1"]["m"], qb["conv1"]["t"])
    if conv2s1_fn is not None and stride == 1:
        # Stride-1 conv2 override, e.g. the per-tap int8 Winograd path
        # (serving/winograd.py::conv3x3_wino_rq — NOT bit-exact, gated by
        # tools/quant_accuracy.py).
        y2 = conv2s1_fn(y1, qb["conv2"])
    elif conv2_fn is not None and stride == 2:
        # Pallas dense-dot kernel for the stride-2 transition conv2
        # (serving/pallas_int8.py::transition_conv2_pallas): bit-identical.
        y2 = conv2_fn(y1, qb["conv2"])
    elif conv2_tiles and stride == 1:
        y2 = _conv3x3_retile_rq(y1, qb["conv2"], conv2_tiles)
    else:
        acc = _conv_i8(y1, qb["conv2"]["wq"], stride=stride, pad=1)
        y2 = _requant(acc, qb["conv2"]["m"], qb["conv2"]["t"])
    acc = _dot_1x1_i8(y2, qb["conv3"]["wq"])
    if qb["downsample"] is not None:
        # Requantize the downsample branch to int8 on its own (a two-dot
        # epilogue defeats XLA's fusion — profiled: the conv3 chain spills a
        # 4-byte/elem accumulator to HBM, ~11 ms/iter at layer1 b256 — while
        # two single-chain dot+requant fusions stay on-chip). The branch
        # carries its OWN calibrated scale (quant.py): at the output scale it
        # can exceed +-127 pre-add, and round 2's int16-at-output-scale
        # answer cost 2 B/elem of spill (2.9 ms at layer1 alone @b256). The
        # conv3 epilogue rescales by s_ds/s_out when adding. Extra rounding
        # on the branch (<= 0.5 LSB at s_ds) is covered by
        # tools/quant_accuracy.py; identity blocks are untouched.
        xs = x_q[:, ::stride, ::stride, :] if stride > 1 else x_q
        dacc = _dot_1x1_i8(xs, qb["downsample"]["wq"])
        dsf = dacc.astype(jnp.float32) * qb["downsample"]["m"] + qb["downsample"]["t"]
        ds_q = jnp.clip(jnp.round(dsf), -127, 127).astype(jnp.int8)
        extra = ds_q.astype(jnp.float32) * qb["ds_rescale"]
    else:
        extra = x_q.astype(jnp.float32) * qb["rx"]
    return _requant(acc, qb["conv3"]["m"], qb["conv3"]["t"], extra=extra)


def int8_forward(q: Dict, images, S: int = 7, impl: Dict | None = None):
    """Quantized serving forward -> (N, S, S, B*5+C) f32 grid.

    ``images``: normalized float images, or raw resized uint8 RGB (the
    4x-smaller wire format — ImageNet normalization then runs inside the
    input-quantize fusion; see _normalize_if_uint8 / pallas_stem.py).
    """
    impl = impl or {}

    stem_wq = q["stem"]["wq"]
    if stem_wq.shape[0] == 4:  # space-to-depth stem (quant.s2d_stem_weights)
        # NOTE: quant-vs-s2d order is a no-op for XLA (elementwise quant
        # commutes with the shuffle and the compiler canonicalizes either
        # form to the same graph: quant fusion + two relayout copies,
        # 1.76 ms @b256 profiled round 3). Killing the copies needs the
        # Pallas stem-front kernel (serving/pallas_stem.py), selected via
        # ``impl["stem_front"]``.
        stem_front = impl.get("stem_front", None)
        # The Pallas stem front's column-parity lane slice needs the batch
        # (its lane dim) 128-aligned; other batches fall back to XLA.
        if stem_front is not None and images.shape[0] % 128 == 0:
            xs = stem_front(images, q["s_img"])
        else:
            x_f = _normalize_if_uint8(images)
            n, h, w, c = x_f.shape
            xs_f = (
                x_f.reshape(n, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, h // 2, w // 2, 4 * c)
            )
            xs = _quantize_input(xs_f, q["s_img"])
        acc = lax.conv_general_dilated(
            xs, stem_wq, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    else:
        x_q = _quantize_input(_normalize_if_uint8(images), q["s_img"])
        acc = _conv_i8(x_q, stem_wq, stride=2, pad=3)
    x_q = _requant(acc, q["stem"]["m"], q["stem"]["t"])
    x_q = lax.reduce_window(
        x_q, jnp.int8(-128), lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )

    for si, blocks in enumerate(q["layers"]):
        # impl[f"layer{i}"] is a STAGE-CHAIN callable
        # (x_q, qblocks, real_w=None) -> x_q over the stage's stride-1
        # blocks (serving.pallas_int8.chain_pallas). Stride-2 transition
        # blocks (layers 2-4) stay on the XLA path; layer1's stride-1
        # transition (downsample included) is part of the chain.
        chain_fn = impl.get(f"layer{si + 1}", None)
        t2_fn = impl.get("transition_conv2", {}).get(f"layer{si + 1}", None)
        if chain_fn is None:
            tiles = impl.get("conv2_tiles", {}).get(f"layer{si + 1}", 0)
            for bi, qb in enumerate(blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                s1_fn = impl.get("conv2_s1", {}).get(f"l{si + 1}b{bi}", None)
                x_q = _block_xla(x_q, qb, stride, conv2_tiles=tiles,
                                 conv2_fn=t2_fn, conv2s1_fn=s1_fn)
            continue
        start = 0
        if si > 0:
            x_q = _block_xla(x_q, blocks[0], 2, conv2_fn=t2_fn)
            start = 1
        if start >= len(blocks):  # stage with only its transition block
            continue
        w = x_q.shape[2]
        if w % 8 != 0:
            # Pad W to the int8 lane multiple once for the whole chain
            # (28/14-wide stages fail the kernel's sublane alignment).
            wp = (w + 31) // 32 * 32
            x_q = jnp.pad(x_q, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
            x_q = chain_fn(x_q, blocks[start:], real_w=w)
            x_q = x_q[:, :, :w, :]
        else:
            x_q = chain_fn(x_q, blocks[start:])

    head = q["head"]
    for i, stride in ((1, 1), (2, 2), (3, 1), (4, 1)):
        conv_fn = impl.get(f"head_conv{i}", None)
        qc = head[f"conv{i}"]
        if conv_fn is not None:
            x_q = conv_fn(x_q, qc)
        else:
            acc = _conv_i8(x_q, qc["wq"], stride=stride, pad=1)
            x_q = _requant(acc, qc["m"], qc["t"], leaky=True)

    n = x_q.shape[0]
    fc1 = head["fc1"]
    if "wq" in fc1:
        # int8 fc1: the flattened head activation is ALREADY int8 — dot it
        # straight against per-channel int8 weights (s32 accumulate, fma
        # epilogue y = acc * (s_act * s_w) + b). Kills the int8->bf16
        # convert_multiply pass (0.65 ms @b256) and halves the 411 MB fc1
        # weight read; only new error is the per-channel weight rounding
        # (gated by tools/quant_accuracy.py).
        acc = lax.dot_general(
            x_q.reshape(n, -1), fc1["wq"],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        x = acc.astype(jnp.float32) * fc1["m"] + fc1["b"]
    else:
        x = x_q.astype(jnp.bfloat16) * head["s_out4"].astype(jnp.bfloat16)
        x = x.reshape(n, -1)
        x = jnp.dot(x, fc1["w"], preferred_element_type=jnp.float32)
        x = x + fc1["b"]
    x = jnp.where(x > 0, x, 0.1 * x).astype(jnp.bfloat16)
    x = jnp.dot(x, head["fc2"]["w"], preferred_element_type=jnp.float32)
    x = x + head["fc2"]["b"]
    return x.reshape(n, S, S, -1)


def default_impl() -> Dict:
    """Production stage-impl map: XLA convs + the Pallas stem front.

    The stem front (quantize + space-to-depth, serving/pallas_stem.py) is
    the one Pallas kernel that beats XLA e2e: it emits the stem conv's
    batch-minor layout directly, deleting XLA's two relayout copies
    (6.9 -> 5.1 ms stem chain, 61.5 -> 60.4 ms e2e @b256/448², bit-exact).

    Every conv-path Pallas/restructuring alternative was measured SLOWER
    e2e on v5e: the bottleneck chain kernels, the batch-folded conv retile,
    the dense-dot transition-conv2 kernel, and the direct 7x7 stem
    (PARITY.md "Performance" table). Root cause is measured, not guessed:
    Mosaic int8 dots run at 12-31 TOPS on the N=64 geometries that dominate
    layer1/stem (experiments/mosaic_int8_dot.py) while XLA's conv path
    achieves ~191 TOPS effective there and is within ~10-15% of a
    geometry-honest speed-of-light for the whole graph. All kernels stay
    available through ``impl`` for future shapes/hardware.
    """
    if jax.default_backend() != "tpu":
        return {}  # Mosaic kernels only lower on TPU (tests use interpret)
    from yolo_tpu.serving.pallas_stem import stem_front_pallas

    return {"stem_front": stem_front_pallas}


def make_int8_engine_fn(
    S: int, B: int, num_classes: int, impl: Dict | None = None, nms_fn=None
):
    """Jitted (q_params, images, conf, nms) -> Detections serving function.

    q_params is a jit argument (weights are NOT baked into the executable).
    ``nms_fn`` selects the NMS implementation (default ops.nms.batched_nms;
    pass ops.pallas_nms.pallas_nms for the fused kernel — both implement
    identical greedy semantics).

    On TPU backends the jit carries the measured-winning XLA options
    (``utils.platform.tpu_compiler_options``: 64 MiB scoped-VMEM fusion
    ceiling, +8.4% on the b256 serving graph — round-5 flag sweep).
    """
    from yolo_tpu.utils.platform import tpu_compiler_options

    nms_fn = nms_fn or batched_nms

    @partial(jax.jit, static_argnames=("conf_threshold", "nms_threshold"),
             compiler_options=tpu_compiler_options() or None)
    def _predict(q, images, conf_threshold, nms_threshold):
        preds = int8_forward(q, images, S=S, impl=impl)
        dets = decode_predictions(
            preds.astype(jnp.float32), S, B, num_classes, conf_threshold
        )
        return nms_fn(dets, nms_threshold)

    return _predict


def make_sharded_int8_engine_fn(
    mesh, S: int, B: int, num_classes: int, impl: Dict | None = None,
    nms_fn=None,
):
    """Data-parallel serving: the int8 engine jitted over a device mesh.

    Inference is embarrassingly parallel over the batch — q-params
    replicate, images shard over the mesh's 'data' axis, and every device
    runs the identical forward+decode+NMS on its shard with ZERO
    cross-device collectives (XLA partitions the whole graph 1:1). This is
    the multi-chip throughput path a v5e-8 serves with: per-chip batch B/8,
    aggregate ~8x the single-chip img/s.

    The Mosaic stem-front kernel has no GSPMD partitioning rule, so the
    sharded engine always uses the (bit-identical) XLA stem front —
    ``impl["stem_front"]`` is dropped if present. The batch must be
    divisible by the 'data' axis (pad ragged batches:
    ``yolo_tpu.data.pad_batch``).

    Returns ``predict(q, images, conf, nms)``; place ``images`` with
    ``parallel.mesh.put_sharded`` (host arrays are accepted too — jit
    shards them on the fly).
    """
    from jax.sharding import NamedSharding, PartitionSpec as _P

    from yolo_tpu.utils.platform import tpu_compiler_options

    impl = dict(impl or {})
    impl.pop("stem_front", None)
    nms_fn = nms_fn or batched_nms
    n_spatial = _P("data", None, None, None)

    @partial(
        jax.jit,
        static_argnames=("conf_threshold", "nms_threshold"),
        in_shardings=(
            None,  # q: replicated (resolved against the pytree)
            NamedSharding(mesh, n_spatial),
        ),
        compiler_options=tpu_compiler_options() or None,
    )
    def _predict(q, images, conf_threshold, nms_threshold):
        preds = int8_forward(q, images, S=S, impl=impl)
        dets = decode_predictions(
            preds.astype(jnp.float32), S, B, num_classes, conf_threshold
        )
        return nms_fn(dets, nms_threshold)

    return _predict


def build_int8_predict(model, variables, calibration_images, impl=None,
                       nms_fn=None, stem_mode="s2d", fc1_mode="int8",
                       wino=()):
    """One-stop build: fold -> calibrate -> quantize -> jitted predict fn.

    ``calibration_images``: iterable of (n, H, W, 3) normalized image batches
    used to set activation scales (a few batches of representative data; for
    benchmarks random inputs work because scales only need magnitude).
    ``wino``: conv names ("head_conv1", "l3b1_conv2", ...) to run via the
    per-tap int8 Winograd F(2,3) path (serving/winograd.py) — per-tap
    activation scales are calibrated on the same batches, and the matching
    engine ``impl`` hooks are installed automatically.
    Returns (predict_fn, q_params).
    """
    from yolo_tpu.serving.fold import fold_flagship
    from yolo_tpu.serving.quant import calibrate_activations, quantize_folded

    folded = fold_flagship(variables)
    act_max = calibrate_activations(folded, calibration_images,
                                    dtype=jnp.bfloat16, wino_points=wino)
    q = quantize_folded(folded, act_max, stem_mode=stem_mode,
                        fc1_mode=fc1_mode, wino=wino)
    if wino:
        from yolo_tpu.serving.winograd import wino_impl_hooks

        impl = wino_impl_hooks(wino, impl)
    fn = make_int8_engine_fn(model.S, model.B, model.num_classes, impl=impl,
                             nms_fn=nms_fn)
    return fn, q
