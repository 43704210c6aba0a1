"""Host-side image transforms: resize/normalize and YOLO-paper augmentation.

Mirrors the reference's torchvision v2 pipelines (src/yolo/dataset.py:224-233
eval; 288-319 train) with numpy/cv2/PIL:

- eval: Resize(448, bilinear antialias) + ImageNet normalize
- train: RandomResizedCrop(scale (0.8, 1.2), ratio (0.8, 1.2)) with bbox
  propagation + ColorJitter(brightness 0.5, saturation 0.5, hue 0.1), then
  normalize. Distribution-equivalent (torchvision samples area-scale uniformly
  and log-ratio uniformly with 10 attempts then center fallback; boxes are
  clamped to the crop and then to [0, 1], reference dataset.py:384-388).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image_rgb(path: str) -> np.ndarray:
    """Decode an image file to HWC uint8 RGB (cv2 fast path, PIL fallback)."""
    if _HAS_CV2:
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is not None:
            return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    return np.asarray(Image.open(path).convert("RGB"))


# Fused normalize constants: (x/255 - mean)/std == x*scale + bias, one pass.
_NORM_SCALE = (1.0 / (255.0 * IMAGENET_STD)).astype(np.float32)
_NORM_BIAS = (-IMAGENET_MEAN / IMAGENET_STD).astype(np.float32)


def resize_bilinear(
    image: np.ndarray, size: Tuple[int, int], exact: bool = True
) -> np.ndarray:
    """Resize HWC uint8 to (h, w), antialiased on downscale.

    ``exact=True`` (the eval/inference default) uses PIL's antialiased
    bilinear — the filter torchvision's ``v2.Resize(antialias=True)``
    implements, so eval preprocessing matches the reference pipeline
    (dataset.py:226). ``exact=False`` uses cv2 INTER_AREA/INTER_LINEAR:
    ~8x faster, only approximately antialiased — fine for the stochastic
    train-augmentation path, a measurable numerics delta for eval.
    """
    h, w = size
    if _HAS_CV2 and not exact:
        shrinking = w < image.shape[1] or h < image.shape[0]
        interp = cv2.INTER_AREA if shrinking else cv2.INTER_LINEAR
        return cv2.resize(image, (w, h), interpolation=interp)
    return np.asarray(
        Image.fromarray(image).resize((w, h), Image.BILINEAR), np.uint8
    )


def normalize(image: np.ndarray) -> np.ndarray:
    """HWC uint8 -> float32 ImageNet-normalized (single fused pass)."""
    return image.astype(np.float32) * _NORM_SCALE + _NORM_BIAS


def eval_transform(
    image: np.ndarray, target_size: Tuple[int, int], normalize_host: bool = True
) -> np.ndarray:
    """Validation/test transform: resize (+ normalize unless deferred).

    ``normalize_host=False`` returns resized uint8 so normalization runs
    on-device inside the jitted step (4x smaller host->device transfer and
    one less float pass on the host; see ``device_normalize``).
    """
    resized = resize_bilinear(image, target_size)
    return normalize(resized) if normalize_host else resized


def sample_resized_crop(
    rng: np.random.Generator,
    height: int,
    width: int,
    scale: Tuple[float, float] = (0.8, 1.2),
    ratio: Tuple[float, float] = (0.8, 1.2),
    attempts: int = 10,
) -> Tuple[int, int, int, int]:
    """Sample a crop window (top, left, h, w) à la RandomResizedCrop.

    Area fraction uniform in ``scale``, aspect ratio log-uniform in ``ratio``;
    falls back to a centered max-size crop after ``attempts`` misses — the
    torchvision algorithm the reference relies on (dataset.py:299-304).
    """
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(attempts):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # Center fallback, clipping aspect to the valid range.
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def _adjust_colors_u8(
    rng: np.random.Generator,
    image: np.ndarray,
    brightness: float,
    saturation: float,
    hue: float,
) -> np.ndarray:
    """ColorJitter-equivalent jitter on uint8 via cv2 (fast path).

    Same factor distributions and random op order as the float version; the
    uint8 intermediate rounding is within the jitter's own noise floor
    (augmentation is stochastic-equivalent by design, SURVEY §7).
    """
    ops = []
    if brightness > 0:
        ops.append(("b", rng.uniform(max(0.0, 1 - brightness), 1 + brightness)))
    if saturation > 0:
        ops.append(("s", rng.uniform(max(0.0, 1 - saturation), 1 + saturation)))
    if hue > 0:
        ops.append(("h", rng.uniform(-hue, hue)))
    rng.shuffle(ops)

    for kind, value in ops:
        if kind == "b":
            image = cv2.convertScaleAbs(image, alpha=value, beta=0.0)
        elif kind == "s":
            gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)  # 0.299/0.587/0.114
            gray3 = cv2.cvtColor(gray, cv2.COLOR_GRAY2RGB)
            image = cv2.addWeighted(image, value, gray3, 1.0 - value, 0.0)
        else:
            hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(round(value * 180))) % 180
            image = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return image


def _adjust_colors(
    rng: np.random.Generator,
    image_f: np.ndarray,
    brightness: float,
    saturation: float,
    hue: float,
) -> np.ndarray:
    """ColorJitter-equivalent brightness/saturation/hue in random order."""
    ops = []
    if brightness > 0:
        factor = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(("b", factor))
    if saturation > 0:
        factor = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(("s", factor))
    if hue > 0:
        shift = rng.uniform(-hue, hue)
        ops.append(("h", shift))
    rng.shuffle(ops)

    for kind, value in ops:
        if kind == "b":
            image_f = np.clip(image_f * value, 0.0, 1.0)
        elif kind == "s":
            gray = (
                image_f[..., 0] * 0.299
                + image_f[..., 1] * 0.587
                + image_f[..., 2] * 0.114
            )[..., None]
            image_f = np.clip(gray + (image_f - gray) * value, 0.0, 1.0)
        else:  # hue shift via HSV
            if _HAS_CV2:
                hsv = cv2.cvtColor(
                    (image_f * 255).astype(np.uint8), cv2.COLOR_RGB2HSV
                ).astype(np.int16)
                hsv[..., 0] = (hsv[..., 0] + int(round(value * 180))) % 180
                image_f = (
                    cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
                        np.float32
                    )
                    / 255.0
                )
            else:  # pragma: no cover - PIL fallback
                hsv = np.asarray(
                    Image.fromarray((image_f * 255).astype(np.uint8)).convert("HSV"),
                    np.int16,
                )
                hsv[..., 0] = (hsv[..., 0] + int(round(value * 255))) % 256
                image_f = (
                    np.asarray(
                        Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB"),
                        np.float32,
                    )
                    / 255.0
                )
    return image_f


def device_normalize(images):
    """ImageNet-normalize a uint8 NHWC device array inside a jitted graph.

    Counterpart of host ``normalize`` for loaders running with
    ``normalize_host=False``; elementwise, fuses into the first conv's input.
    """
    import jax.numpy as jnp

    return images.astype(jnp.float32) * jnp.asarray(_NORM_SCALE) + jnp.asarray(
        _NORM_BIAS
    )


def train_transform(
    image: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    target_size: Tuple[int, int] = (448, 448),
    normalize_host: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Augment one sample: random resized crop (box-aware) + color jitter.

    Args:
        image: HWC uint8 RGB.
        boxes: (M, 4) normalized center-format boxes (may be empty).
        rng: numpy Generator (per-worker, seeded for reproducibility).

    Returns (normalized float32 image (H, W, 3), transformed boxes (M, 4)).
    Boxes are clamped to the crop then to [0, 1]; degenerate boxes are kept,
    matching the reference (dataset.py:384-389 keeps zero-area boxes).
    """
    height, width = image.shape[:2]
    top, left, ch, cw = sample_resized_crop(rng, height, width)

    crop = image[top : top + ch, left : left + cw]
    if _HAS_CV2:
        crop = cv2.resize(
            crop, (target_size[1], target_size[0]), interpolation=cv2.INTER_LINEAR
        )
        crop = _adjust_colors_u8(rng, crop, brightness=0.5, saturation=0.5, hue=0.1)
        image_f = normalize(crop) if normalize_host else crop
    else:  # pragma: no cover
        crop = resize_bilinear(crop, target_size)
        image_f = crop.astype(np.float32) / 255.0
        image_f = _adjust_colors(
            rng, image_f, brightness=0.5, saturation=0.5, hue=0.1
        )
        if normalize_host:
            image_f = (image_f - IMAGENET_MEAN) / IMAGENET_STD
        else:
            image_f = (image_f * 255.0 + 0.5).astype(np.uint8)

    if boxes.size:
        corners = np.empty_like(boxes)
        corners[:, 0] = (boxes[:, 0] - boxes[:, 2] / 2) * width
        corners[:, 1] = (boxes[:, 1] - boxes[:, 3] / 2) * height
        corners[:, 2] = (boxes[:, 0] + boxes[:, 2] / 2) * width
        corners[:, 3] = (boxes[:, 1] + boxes[:, 3] / 2) * height
        # Shift into crop frame and clamp to it (v2 transforms clamp to canvas).
        corners[:, [0, 2]] = np.clip(corners[:, [0, 2]] - left, 0, cw)
        corners[:, [1, 3]] = np.clip(corners[:, [1, 3]] - top, 0, ch)
        out = np.empty_like(boxes)
        out[:, 0] = (corners[:, 0] + corners[:, 2]) / 2 / cw
        out[:, 1] = (corners[:, 1] + corners[:, 3]) / 2 / ch
        out[:, 2] = (corners[:, 2] - corners[:, 0]) / cw
        out[:, 3] = (corners[:, 3] - corners[:, 1]) / ch
        boxes = np.clip(out, 0.0, 1.0)
    return image_f, boxes
