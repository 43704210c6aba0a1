"""Serialized int8 engine artifacts: save/load the calibrated q-params.

The serving build (fold -> calibrate -> quantize, serving/engine.py) is
deterministic but needs the fp32 checkpoint plus calibration data. A
deployment box should need neither: ``save_engine`` freezes the quantized
parameter tree (weights already int8, requant fma constants, activation
scales) into a single .npz — the TPU analogue of exporting a TensorRT
engine plan — and ``load_engine`` restores it for ``make_int8_engine_fn``
/ ``int8_forward`` with no model, no calibration, and no fold step.

The reference has no serving-export path (its inference engine re-loads
the training checkpoint every time, /root/reference/src/predict.py:23-63);
this subsystem is TPU-build-only surface.

Format: one .npz whose keys are '/'-joined tree paths; list-valued levels
(the 4 ResNet stages, blocks within a stage) use integer path segments.
None leaves (identity blocks' ``downsample``/``rx``) are encoded by
absence plus a sentinel key so the tree round-trips exactly. A '__meta__'
JSON entry pins the format version and the model geometry (S, B,
num_classes) the engine fn needs.
"""

from __future__ import annotations

import io
import json
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ENGINE_FORMAT_VERSION = 1
AOT_FORMAT_VERSION = 1
_NONE = "__none__"


def _flatten(prefix: str, node, out: Dict[str, np.ndarray]):
    if node is None:
        out[prefix + "/" + _NONE] = np.zeros((), np.int8)
    elif isinstance(node, dict):
        for k, v in node.items():
            _flatten(f"{prefix}/{k}" if prefix else k, v, out)
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            _flatten(f"{prefix}/{i}", v, out)
        out[prefix + "/__len__"] = np.asarray(len(node), np.int64)
    else:
        out[prefix] = np.asarray(node)


def save_engine(path, q: Dict, S: int, B: int, num_classes: int) -> None:
    """Write the quantized engine params + geometry to ``path`` (.npz)."""
    flat: Dict[str, np.ndarray] = {}
    _flatten("", q, flat)
    # npz can't store ml_dtypes (the fc weights are bfloat16): view them as
    # uint16 and record the true dtype per key for the loader.
    dtypes: Dict[str, str] = {}
    for k, v in list(flat.items()):
        if v.dtype == jnp.bfloat16:
            dtypes[k] = "bfloat16"
            flat[k] = v.view(np.uint16)
    flat["__meta__"] = np.frombuffer(
        json.dumps(
            {
                "format_version": ENGINE_FORMAT_VERSION,
                "S": S,
                "B": B,
                "num_classes": num_classes,
                "dtypes": dtypes,
            }
        ).encode(),
        dtype=np.uint8,
    )
    buf = io.BytesIO()
    np.savez(buf, **flat)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def _unflatten(flat: Dict[str, np.ndarray]):
    # Group keys by their first path segment, recurse.
    if set(flat) == {_NONE}:
        return None
    if "__len__" in {k.split("/", 1)[0] for k in flat}:
        n = int(flat["__len__"])
        return [
            _unflatten(
                {
                    k.split("/", 1)[1]: v
                    for k, v in flat.items()
                    if k.split("/", 1)[0] == str(i)
                }
            )
            for i in range(n)
        ]
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in flat.items():
        head, _, rest = k.partition("/")
        if rest:
            groups.setdefault(head, {})[rest] = v
        else:
            groups[head] = v  # type: ignore[assignment]
    return {
        k: (_unflatten(v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in groups.items()
    }


def load_engine(path) -> Tuple[Dict, Dict]:
    """Read a saved engine: returns (q_params, meta).

    Raises ValueError on a missing/newer format version so stale artifacts
    fail loudly instead of mis-executing.
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    meta_raw = flat.pop("__meta__", None)
    if meta_raw is None:
        raise ValueError(f"{path} is not a yolo-tpu engine artifact")
    meta = json.loads(bytes(meta_raw.tobytes()).decode())
    if meta.get("format_version", 0) > ENGINE_FORMAT_VERSION:
        raise ValueError(
            f"engine artifact format {meta['format_version']} is newer than"
            f" this build supports ({ENGINE_FORMAT_VERSION})"
        )
    for k, dt in meta.get("dtypes", {}).items():
        flat[k] = flat[k].view(jnp.bfloat16 if dt == "bfloat16" else dt)
    return _unflatten(flat), meta


# --------------------------------------------------------------------------
# AOT artifact: q-params + the serving graph itself as serialized StableHLO.
# --------------------------------------------------------------------------

def _register_detections_serialization():
    """jax.export needs named serialization for custom pytree output types."""
    from yolo_tpu.ops.decode import Detections

    try:
        jax.export.register_namedtuple_serialization(
            Detections, serialized_name="yolo_tpu.ops.decode.Detections"
        )
    except ValueError:
        pass  # already registered (idempotent across reloads)


def save_compiled_engine(
    path,
    q: Dict,
    S: int,
    B: int,
    num_classes: int,
    *,
    batch_size: int,
    conf_threshold: float,
    nms_threshold: float,
    image_size: int = 448,
    dtype=np.uint8,
    platforms: Tuple[str, ...] = ("tpu", "cpu"),
    nms_fn=None,
) -> None:
    """Freeze the FULL serving graph — not just its parameters — to one file.

    ``save_engine`` removes the checkpoint/fold/calibration steps from a
    deployment box but still re-traces the Python engine code at load.
    This goes one step further down the TensorRT-plan road: the whole
    jitted forward+decode+NMS graph is exported to **StableHLO**
    (``jax.export``) with the thresholds and batch geometry baked in, and
    bundled with the q-params in a single .npz. ``load_compiled_engine``
    replays that frozen graph instead of re-tracing the engine Python, so
    engine-code drift can never change a deployed artifact's numerics
    (StableHLO carries jax.export's cross-version stability guarantees).
    The package itself is still imported at load (the Detections pytree
    type lives in ``ops.decode``) — the immutability claim is about the
    numerics, not the import graph. The reference has no analogue
    (its predict path re-loads the training checkpoint per run,
    /root/reference/src/predict.py:23-63).

    ``platforms`` lowers one module per target; the default ships a graph
    that runs on both TPU serving hosts and CPU dev boxes. The export uses
    the pure-XLA engine (``impl={}``) — bit-identical to the Pallas-front
    build and portable across platforms/topologies.

    ``dtype=np.uint8`` bakes the raw-RGB wire format (ImageNet
    normalization fused in-graph); pass np.float32 to feed normalized
    images instead.
    """
    from yolo_tpu.serving.engine import make_int8_engine_fn

    _register_detections_serialization()
    fn = make_int8_engine_fn(S, B, num_classes, impl={}, nms_fn=nms_fn)

    def closed(q, images):
        return fn(
            q,
            images,
            conf_threshold=float(conf_threshold),
            nms_threshold=float(nms_threshold),
        )

    img_aval = jax.ShapeDtypeStruct(
        (int(batch_size), int(image_size), int(image_size), 3),
        np.dtype(dtype),
    )
    q_avals = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), q
    )
    exported = jax.export.export(jax.jit(closed), platforms=list(platforms))(
        q_avals, img_aval
    )
    blob = np.frombuffer(exported.serialize(), dtype=np.uint8)

    flat: Dict[str, np.ndarray] = {}
    _flatten("", q, flat)
    dtypes: Dict[str, str] = {}
    for k, v in list(flat.items()):
        if v.dtype == jnp.bfloat16:
            dtypes[k] = "bfloat16"
            flat[k] = v.view(np.uint16)
    flat["__stablehlo__"] = blob
    flat["__aot_meta__"] = np.frombuffer(
        json.dumps(
            {
                "aot_format_version": AOT_FORMAT_VERSION,
                "S": S,
                "B": B,
                "num_classes": num_classes,
                "batch_size": int(batch_size),
                "image_size": int(image_size),
                "conf_threshold": float(conf_threshold),
                "nms_threshold": float(nms_threshold),
                "dtype": np.dtype(dtype).name,
                "platforms": list(platforms),
                "dtypes": dtypes,
            }
        ).encode(),
        dtype=np.uint8,
    )
    buf = io.BytesIO()
    np.savez(buf, **flat)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def load_compiled_engine(path) -> Tuple[Callable, Dict]:
    """Load an AOT artifact: returns ``(predict(images) -> Detections, meta)``.

    ``predict`` is the deserialized StableHLO module under ``jax.jit`` with
    the bundled q-params passed as runtime arguments (NOT baked into the
    executable — the axon closure trap, CLAUDE.md #2). The batch size,
    image size, wire dtype, and thresholds are fixed at export time and
    recorded in ``meta``.
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    meta_raw = flat.pop("__aot_meta__", None)
    blob = flat.pop("__stablehlo__", None)
    if meta_raw is None or blob is None:
        raise ValueError(f"{path} is not a yolo-tpu AOT engine artifact")
    meta = json.loads(bytes(meta_raw.tobytes()).decode())
    if meta.get("aot_format_version", 0) > AOT_FORMAT_VERSION:
        raise ValueError(
            f"AOT artifact format {meta['aot_format_version']} is newer than"
            f" this build supports ({AOT_FORMAT_VERSION})"
        )
    for k, dt in meta.get("dtypes", {}).items():
        flat[k] = flat[k].view(jnp.bfloat16 if dt == "bfloat16" else dt)
    q = _unflatten(flat)
    _register_detections_serialization()
    exported = jax.export.deserialize(bytearray(blob.tobytes()))
    # The serving-time compile of the portable module carries the measured
    # production options (64 MiB scoped VMEM, round-5 sweep) on TPU hosts.
    from yolo_tpu.utils.platform import tpu_compiler_options

    call = jax.jit(exported.call,
                   compiler_options=tpu_compiler_options() or None)

    def predict(images):
        return call(q, images)

    return predict, meta
