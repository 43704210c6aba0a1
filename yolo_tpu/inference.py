"""Inference engine: image -> jitted forward -> on-device decode + NMS.

API parity with the reference engine (src/yolo/inference.py:12-317) — same
``predict`` / ``parse_predictions`` / ``non_max_suppression`` / ``iou`` surface,
including the deprecated ``iou_threshold`` alias — but the compute path is
TPU-native: ONE jitted graph runs forward + decode + per-class NMS for a whole
batch, and only the final (tiny) survivor list crosses to the host. The
reference instead loops S x S x B cells in Python with an ``.item()`` sync per
scalar (inference.py:174-208), the exact pattern the BASELINE throughput target
forbids.
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from yolo_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    eval_transform,
)
from yolo_tpu.ops.boxes import EPSILON
from yolo_tpu.ops.decode import Detections, decode_predictions
from yolo_tpu.ops.nms import batched_nms


def preprocess_array(
    image: np.ndarray, size: int = 448, value_range: str = "auto"
) -> np.ndarray:
    """HWC uint8/float RGB -> normalized float32 (size, size, 3).

    Single source of truth with the dataset path (data/transforms.py), so
    predict.py and evaluate.py preprocess identically.

    ``value_range`` declares float inputs' scale: "unit" ([0, 1]), "255"
    ([0, 255]), or "auto" (max<=1.0 heuristic — ambiguous for dark 0-255
    images; pass an explicit range when known). Conversion rounds to nearest
    rather than truncating.
    """
    if image.dtype != np.uint8:
        if value_range not in ("auto", "unit", "255"):
            raise ValueError(f"value_range must be auto|unit|255, got {value_range!r}")
        is_unit = value_range == "unit" or (
            value_range == "auto" and image.max() <= 1.0
        )
        scaled = image * 255.0 if is_unit else image
        image = np.clip(np.round(scaled), 0, 255).astype(np.uint8)
    return eval_transform(image, (size, size))


class YOLOInference:
    """Run object detection with a jitted forward + postprocessing graph.

    Args:
        model: a linen ``YOLOv1`` module (has .S, .B, .num_classes).
        variables: its {'params': ..., 'batch_stats': ...} pytree.
        image_size: input resolution (default 448).
        nms_impl: "xla" (argsort + masked scan, the default) or "pallas"
            (fused VMEM-resident selection kernel, yolo_tpu/ops/pallas_nms.py).
            Both implement identical greedy semantics and tie-breaking.
        optimize: None (exact bf16/fp32 graph, the parity-pinned default) or
            "int8" — rebuild the forward as the int8-resident serving
            pipeline (yolo_tpu/serving/): BN-folded, per-channel-quantized
            weights, calibrated activations, Pallas fused bottlenecks on the
            HBM-bound stages. ~2x throughput; accuracy gated by
            tools/quant_accuracy.py.
        calibration: optional iterable of normalized image batches for int8
            activation calibration. When omitted, the engine calibrates
            lazily on the first batch passed to predict — real data, so
            activation scales match the deployment distribution (synthetic
            noise can under-estimate real maxima and silently clip).
        wino: conv names ("head_conv1", "l3b1_conv2", ...) to run via the
            per-tap int8 Winograd F(2,3) path (serving/winograd.py) —
            an opt-in, NOT bit-exact vs the direct convs (accuracy gated
            by tools/quant_accuracy.py --wino); measured slower on v5e
            (PARITY.md). Saved artifacts keep the wino params and reload
            with the hooks re-installed.

    Example:
        >>> engine = YOLOInference(model, variables)
        >>> detections = engine.predict("image.jpg", conf_threshold=0.25)
    """

    def __init__(
        self, model, variables, image_size: int = 448, nms_impl: str = "xla",
        optimize: str | None = None, calibration=None,
        engine_artifact: str | None = None, wino=(),
    ):
        self.model = model
        self.variables = variables
        self.image_size = image_size
        if nms_impl not in ("xla", "pallas"):
            raise ValueError(f"nms_impl must be 'xla' or 'pallas', got {nms_impl!r}")
        if optimize not in (None, "int8"):
            raise ValueError(f"optimize must be None or 'int8', got {optimize!r}")
        if engine_artifact is not None and optimize != "int8":
            raise ValueError("engine_artifact requires optimize='int8'")
        if nms_impl == "pallas":
            from yolo_tpu.ops.pallas_nms import pallas_nms as _nms
        else:
            _nms = batched_nms

        self._int8_state: dict = {}
        if optimize == "int8":
            if engine_artifact is not None:
                self._predict_batch = self._load_int8_artifact(
                    model, engine_artifact, _nms
                )
            else:
                self._predict_batch = self._build_int8(
                    model, variables, calibration, _nms, wino=tuple(wino)
                )
            return

        # Variables are an explicit jit argument: closing over them would bake
        # the full parameter tree into the compiled program as constants
        # (minutes of compile + an executable-embedded copy of the weights).
        # The bf16 graph carries its measured scoped-VMEM optimum (96 MiB,
        # +4.4% @b256 — utils.platform._SCOPED_VMEM_KIB); {} on non-TPU.
        from yolo_tpu.utils.platform import tpu_compiler_options

        @partial(jax.jit, static_argnames=("conf_threshold", "nms_threshold"),
                 compiler_options=tpu_compiler_options("bf16") or None)
        def _predict_batch_impl(variables, images, conf_threshold, nms_threshold):
            if images.dtype == jnp.uint8:
                # uint8 wire format: raw resized RGB, ImageNet-normalized
                # in-graph (fuses into the first conv's input read; 4x less
                # host->device traffic than float32).
                from yolo_tpu.data.transforms import device_normalize

                images = device_normalize(images)
            preds = model.apply(variables, images, train=False)
            dets = decode_predictions(
                preds.astype(jnp.float32),
                model.S,
                model.B,
                model.num_classes,
                conf_threshold,
            )
            return _nms(dets, nms_threshold)

        self._predict_batch = lambda images, conf, nms: _predict_batch_impl(
            self.variables, images, conf, nms
        )
        # Raw jitted graph (variables as an explicit arg) for tooling that
        # needs .lower()/.compile() — tools/op_ledger.py --bf16 ledgers it.
        self._predict_arrays = _predict_batch_impl

    def _build_int8(self, model, variables, calibration, nms_fn, wino=()):
        from yolo_tpu.serving import build_int8_predict
        from yolo_tpu.serving.engine import default_impl

        state = self._int8_state
        if calibration is not None:
            # Materialize first: a generator would be exhausted by the build,
            # making the n_calib count below read 0 and save_engine's
            # calibration gate spuriously refuse a fully calibrated engine.
            calibration = list(calibration)
            predict, q = build_int8_predict(
                model, variables, calibration, impl=default_impl(),
                nms_fn=nms_fn, wino=wino,
            )
            state["fn"], state["q"] = predict, q
            state["n_calib"] = sum(int(b.shape[0]) for b in calibration)
            return lambda images, conf, nms: predict(q, images, conf, nms)

        # No calibration data given: calibrate LAZILY on the first real batch
        # the caller predicts. Real-image activation maxima can exceed
        # synthetic-noise-derived scales (silent clipping on real
        # checkpoints), so deferring to genuine data beats a noise default;
        # the engine build just moves to the first predict call.
        def lazy_predict(images, conf, nms):
            # Batched callers (predict_batch_files) zero-pad ragged chunks to
            # a fixed batch size; "pending_valid" carries the REAL image count
            # so padding rows neither inflate n_calib past the save_engine
            # gate nor contaminate the calibration activation maxima.
            valid = state.pop("pending_valid", None)
            if "fn" not in state:
                n_calib = int(jnp.shape(images)[0] if valid is None else valid)
                if n_calib < self.MIN_CALIB_IMAGES:
                    import warnings

                    warnings.warn(
                        f"int8 engine calibrating activation scales on the"
                        f" first predict batch of only {n_calib} image(s);"
                        f" scales are pinned for the engine's lifetime and a"
                        f" small/unrepresentative batch can underestimate"
                        f" activation maxima (clipping). Pass calibration="
                        f"[batches] to YOLOInference for deployment-grade"
                        f" scales.",
                        stacklevel=2,
                    )
                calib_imgs = jnp.asarray(images)[:n_calib]
                if calib_imgs.dtype == jnp.uint8:
                    from yolo_tpu.data.transforms import device_normalize

                    calib_imgs = device_normalize(calib_imgs)
                state["fn"], state["q"] = build_int8_predict(
                    model, variables, [calib_imgs.astype(jnp.float32)],
                    impl=default_impl(), nms_fn=nms_fn, wino=wino,
                )
                state["n_calib"] = n_calib
            return state["fn"](state["q"], images, conf, nms)

        return lazy_predict

    def _load_int8_artifact(self, model, path, nms_fn):
        """Deployment path: restore a saved engine (serving/export.py) —
        no fold, no calibration, and ``variables`` may be None."""
        from yolo_tpu.serving.engine import default_impl, make_int8_engine_fn
        from yolo_tpu.serving.export import load_engine
        from yolo_tpu.serving.winograd import wino_impl_hooks, wino_points_of

        q, meta = load_engine(path)
        for attr in ("S", "B", "num_classes"):
            if getattr(model, attr) != meta[attr]:
                raise ValueError(
                    f"engine artifact {path} was exported for {attr}="
                    f"{meta[attr]} but the model has {getattr(model, attr)}"
                )
        impl = default_impl()
        wino = wino_points_of(q)
        if wino:  # artifact was exported with Winograd convs — keep them
            impl = wino_impl_hooks(wino, impl)
        fn = make_int8_engine_fn(
            meta["S"], meta["B"], meta["num_classes"],
            impl=impl, nms_fn=nms_fn,
        )
        self._int8_state.update(fn=fn, q=q)
        return lambda images, conf, nms: fn(q, images, conf, nms)

    #: Minimum images the activation-scale calibration must have seen before
    #: the engine may be frozen to a deployment artifact without ``force``.
    MIN_CALIB_IMAGES = 8

    def save_engine(self, path, force: bool = False) -> None:
        """Freeze the built int8 engine's q-params to ``path`` (.npz).

        Requires optimize='int8' and a built engine (explicit calibration,
        a loaded artifact, or at least one predict through the lazy path).

        An engine calibrated on fewer than ``MIN_CALIB_IMAGES`` images (e.g.
        a single lazy-calibration image) is REFUSED unless ``force=True``:
        its activation scales underestimate real maxima, and freezing them
        bakes silent clipping into every future deployment of the artifact.
        Engines restored from an artifact are exempt (their scales were
        frozen by an earlier, gated save).
        """
        if "q" not in self._int8_state:
            raise RuntimeError(
                "no built int8 engine to save: construct with"
                " optimize='int8' and either pass calibration= or run one"
                " predict batch first (lazy calibration)"
            )
        n_calib = self._int8_state.get("n_calib")
        if not force and n_calib is not None and n_calib < self.MIN_CALIB_IMAGES:
            raise RuntimeError(
                f"refusing to freeze an int8 engine calibrated on only"
                f" {n_calib} image(s) (< {self.MIN_CALIB_IMAGES}): the"
                f" activation scales would bake unrepresentative maxima into"
                f" the deployment artifact. Pass calibration=[batches] with"
                f" >= {self.MIN_CALIB_IMAGES} representative images (or"
                f" predict a larger first batch), or call"
                f" save_engine(path, force=True) to override."
            )
        from yolo_tpu.serving.export import save_engine as _save

        _save(path, self._int8_state["q"], S=self.model.S, B=self.model.B,
              num_classes=self.model.num_classes)

    # ------------------------------------------------------------------- images
    def load_image(self, image_path: str) -> Image.Image:
        """Load an RGB PIL image (raises FileNotFoundError on bad path)."""
        return Image.open(image_path).convert("RGB")

    def preprocess_image(self, image: Image.Image) -> jnp.ndarray:
        """PIL image -> (1, size, size, 3) normalized device array."""
        arr = eval_transform(
            np.asarray(image.convert("RGB")),
            (self.image_size, self.image_size),
        )
        return jnp.asarray(arr)[None]

    # ------------------------------------------------------------------ predict
    def predict(
        self,
        image_path: str,
        conf_threshold: float = 0.5,
        nms_threshold: float = 0.4,
        class_names: Optional[Sequence[str]] = None,
    ) -> List["Detection"]:
        """Detect objects in one image file; returns Detection objects."""
        image = self.load_image(image_path)
        batch = self.preprocess_image(image)
        dets = self._predict_batch(batch, conf_threshold, nms_threshold)
        return self._to_detections(jax.device_get(dets), 0, class_names)

    def predict_batch_arrays(
        self,
        images: jnp.ndarray,
        conf_threshold: float = 0.5,
        nms_threshold: float = 0.4,
    ) -> Detections:
        """Batched device-side prediction: (N, H, W, 3) -> Detections.

        This is the throughput path: everything stays on device; no host sync
        until the caller consumes the result. ``images`` may be normalized
        floats or raw resized uint8 RGB — the uint8 wire format ships
        1 byte/pixel (4x less host->device traffic) and runs ImageNet
        normalization inside the graph (both the exact and int8 engines).
        """
        return self._predict_batch(images, conf_threshold, nms_threshold)

    def predict_batch_files(
        self,
        image_paths: Sequence[str],
        conf_threshold: float = 0.5,
        nms_threshold: float = 0.4,
        class_names: Optional[Sequence[str]] = None,
        batch_size: int = 16,
    ) -> List[List["Detection"]]:
        """Detect objects in many image files with chunked jitted forwards.

        The TPU-native replacement for the reference's per-file loop
        (src/predict.py:128-186): N files run in ceil(N/batch_size) jitted
        forward+decode+NMS calls instead of N single-image graphs. Partial
        final chunks are zero-padded to ``batch_size`` so every call reuses
        ONE compiled executable. Per-image results are identical to calling
        ``predict`` on each file.
        """
        results: List[List] = []
        for start in range(0, len(image_paths), batch_size):
            chunk = image_paths[start:start + batch_size]
            arrays = [
                eval_transform(
                    np.asarray(self.load_image(str(p)).convert("RGB")),
                    (self.image_size, self.image_size),
                )
                for p in chunk
            ]
            n = len(arrays)
            if n < batch_size:
                arrays.extend(
                    [np.zeros_like(arrays[0])] * (batch_size - n)
                )
            batch = jnp.asarray(np.stack(arrays))
            # Tell a pending lazy int8 calibration how many rows are real
            # images (the rest is zero padding) — see _build_int8.
            self._int8_state["pending_valid"] = n
            dets = jax.device_get(
                self._predict_batch(batch, conf_threshold, nms_threshold)
            )
            results.extend(
                self._to_detections(dets, i, class_names) for i in range(n)
            )
        self._int8_state.pop("pending_valid", None)
        return results

    def parse_predictions(
        self,
        pred: jnp.ndarray,
        conf_threshold: float,
        class_names: Optional[Sequence[str]] = None,
    ) -> List["Detection"]:
        """Decode one raw (S, S, B*5+C) grid into Detection objects (no NMS).

        Parity with reference inference.py:141-210, but vectorized.
        """
        dets = decode_predictions(
            jnp.asarray(pred, jnp.float32)[None],
            self.model.S,
            self.model.B,
            self.model.num_classes,
            conf_threshold,
        )
        return self._to_detections(jax.device_get(dets), 0, class_names)

    def _to_detections(
        self, dets: Detections, index: int, class_names: Optional[Sequence[str]]
    ) -> List["Detection"]:
        from yolo_tpu.schemas import BoundingBox, Detection

        out = []
        boxes = np.asarray(dets.boxes[index])
        scores = np.asarray(dets.scores[index])
        class_ids = np.asarray(dets.class_ids[index])
        valid = np.asarray(dets.valid[index])
        for k in np.nonzero(valid)[0]:
            cid = int(class_ids[k])
            name = class_names[cid] if class_names else f"class_{cid}"
            x, y, w, h = (float(v) for v in boxes[k])
            out.append(
                Detection(
                    class_id=cid,
                    class_name=name,
                    confidence=float(np.clip(scores[k], 0.0, 1.0)),
                    bbox=BoundingBox(
                        x=float(np.clip(x, 0, 1)),
                        y=float(np.clip(y, 0, 1)),
                        width=float(np.clip(w, 0, 1)),
                        height=float(np.clip(h, 0, 1)),
                    ),
                )
            )
        # Confidence-descending, matching reference NMS output ordering.
        out.sort(key=lambda d: -d.confidence)
        return out

    # -------------------------------------------------------- host-side helpers
    def iou(self, bbox1, bbox2) -> float:
        """Pairwise IoU on BoundingBox schemas (reference inference.py:212-249)."""
        x1a, y1a, x2a, y2a = bbox1.to_corners()
        x1b, y1b, x2b, y2b = bbox2.to_corners()
        inter = max(0.0, min(x2a, x2b) - max(x1a, x1b)) * max(
            0.0, min(y2a, y2b) - max(y1a, y1b)
        )
        return inter / (bbox1.area + bbox2.area - inter + EPSILON)

    def non_max_suppression(
        self,
        detections: List["Detection"],
        nms_threshold: Optional[float] = None,
        iou_threshold: Optional[float] = None,
    ) -> List["Detection"]:
        """Host-side greedy per-class NMS on Detection lists.

        Kept for API parity (reference inference.py:251-317), including the
        DeprecationWarning for ``iou_threshold``. The batched device path
        (``predict_batch_arrays``) is the performant route.
        """
        if iou_threshold is not None:
            warnings.warn(
                "Parameter 'iou_threshold' is deprecated, use 'nms_threshold'"
                " instead.",
                DeprecationWarning,
                stacklevel=2,
            )
            threshold = iou_threshold
        elif nms_threshold is not None:
            threshold = nms_threshold
        else:
            threshold = 0.4

        remaining = sorted(detections, key=lambda d: d.confidence, reverse=True)
        keep: List = []
        while remaining:
            current = remaining.pop(0)
            keep.append(current)
            remaining = [
                d
                for d in remaining
                if d.class_id != current.class_id
                or self.iou(current.bbox, d.bbox) < threshold
            ]
        return keep


if __name__ == "__main__":
    # Demo mirroring the reference's __main__ (src/yolo/inference.py:321-358):
    # load checkpoints/yolo_best.{ckpt,pth} and detect on a sample image.
    import sys
    from pathlib import Path

    from yolo_tpu.data.voc import VOC_CLASSES
    from yolo_tpu.models import create_model
    from yolo_tpu.training.checkpoints import load_variables

    checkpoint = next(
        (p for p in (Path("checkpoints/yolo_best.ckpt"),
                     Path("checkpoints/yolo_best.pth")) if p.exists()),
        None,
    )
    if checkpoint is None:
        sys.exit("No checkpoint found at checkpoints/yolo_best.{ckpt,pth}")
    image_path = sys.argv[1] if len(sys.argv) > 1 else "notebooks/sample.jpg"

    model = create_model("resnet", num_classes=20)
    engine = YOLOInference(model, load_variables(checkpoint))
    detections = engine.predict(image_path, conf_threshold=0.25,
                                class_names=VOC_CLASSES)
    print(f"Found {len(detections)} objects:")
    for det in detections:
        print(f"  {det.class_name}: {det.confidence:.2%} at {det.bbox}")
