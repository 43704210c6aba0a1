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
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

ENGINE_FORMAT_VERSION = 1
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
