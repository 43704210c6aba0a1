"""Inference engine tests, mirroring reference tests/test_yolo.py:49-124 and
tests/test_inference_setup.py (engine creation, dummy-image end-to-end
predict, threshold monotonicity, FileNotFoundError, NMS API)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from yolo_tpu.inference import YOLOInference
from yolo_tpu.models import YOLOv1
from yolo_tpu.schemas import BoundingBox, Detection


@pytest.fixture(scope="module")
def engine():
    # Small-S model for fast CPU tests; architecture is the real YOLOv1 with
    # the simple head over the default backbone would be too slow, so use the
    # ResNet-style DetectionHead over a custom cheap backbone.
    from flax import linen as nn

    from yolo_tpu.models import Backbone, DetectionHead

    class Cheap(Backbone):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.avg_pool(x, (32, 32), strides=(32, 32))  # 448 -> 14
            return nn.Conv(16, (1, 1))(x)

    model = YOLOv1(
        num_classes=20, S=7, B=2, backbone=Cheap(), detection_head=DetectionHead()
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 448, 448, 3)),
        train=False,
    )
    return YOLOInference(model, variables)


@pytest.fixture(scope="module")
def sample_image(tmp_path_factory):
    path = tmp_path_factory.mktemp("imgs") / "red.jpg"
    Image.new("RGB", (448, 448), (255, 40, 40)).save(path)
    return str(path)


def test_predict_returns_detection_list(engine, sample_image):
    dets = engine.predict(sample_image, conf_threshold=0.0)
    assert isinstance(dets, list)
    for det in dets:
        assert isinstance(det, Detection)
        assert 0.0 <= det.confidence <= 1.0


def test_predict_threshold_monotonic(engine, sample_image):
    low = engine.predict(sample_image, conf_threshold=-1e9)
    high = engine.predict(sample_image, conf_threshold=0.99)
    assert len(high) <= len(low)


def test_predict_missing_file(engine):
    with pytest.raises(FileNotFoundError):
        engine.predict("/nonexistent/image.jpg")


def test_parse_predictions_threshold(engine):
    pred = np.zeros((7, 7, 30), np.float32)
    pred[3, 3, 0:5] = [0.5, 0.5, 0.2, 0.2, 0.9]
    pred[3, 3, 10 + 4] = 1.0
    dets = engine.parse_predictions(pred, conf_threshold=0.5)
    assert len(dets) == 1
    assert dets[0].class_id == 4
    assert dets[0].confidence == pytest.approx(0.9, abs=1e-5)
    assert len(engine.parse_predictions(pred, conf_threshold=0.95)) == 0


def test_host_nms_api(engine):
    def det(conf, x, cid=0):
        return Detection(
            class_id=cid,
            confidence=conf,
            bbox=BoundingBox(x=x, y=0.5, width=0.2, height=0.2),
        )

    dets = [det(0.9, 0.5), det(0.8, 0.51), det(0.7, 0.9), det(0.85, 0.5, cid=1)]
    kept = engine.non_max_suppression(dets, nms_threshold=0.4)
    confs = sorted(d.confidence for d in kept)
    assert confs == pytest.approx([0.7, 0.85, 0.9])
    # Deprecated alias warns but works.
    with pytest.warns(DeprecationWarning):
        kept2 = engine.non_max_suppression(dets, iou_threshold=0.4)
    assert len(kept2) == len(kept)


def test_iou_helper(engine):
    a = BoundingBox(x=0.5, y=0.5, width=0.2, height=0.2)
    b = BoundingBox(x=0.5, y=0.5, width=0.2, height=0.2)
    assert engine.iou(a, b) == pytest.approx(1.0, abs=1e-4)
    c = BoundingBox(x=0.9, y=0.9, width=0.05, height=0.05)
    assert engine.iou(a, c) == 0.0


def test_preprocess_shape_and_range(engine, sample_image):
    img = engine.load_image(sample_image)
    batch = engine.preprocess_image(img)
    assert batch.shape == (1, 448, 448, 3)
    arr = np.asarray(batch)
    # ImageNet-normalized values live roughly in [-3, 3].
    assert arr.min() > -4 and arr.max() < 4


def test_batched_device_path(engine):
    images = jnp.zeros((4, 448, 448, 3))
    dets = engine.predict_batch_arrays(images, conf_threshold=0.0)
    assert dets.boxes.shape == (4, 98, 4)
    assert dets.valid.shape == (4, 98)


def test_predict_batch_files_matches_per_file(engine, tmp_path):
    """Chunked directory prediction == per-file predict (reference
    src/predict.py:128-186 loops files; here N files -> ceil(N/B) forwards)."""
    rng = np.random.default_rng(7)
    paths = []
    for i in range(5):
        arr = rng.integers(0, 256, (448, 448, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))

    batched = engine.predict_batch_files(
        paths, conf_threshold=0.0, nms_threshold=0.4, batch_size=2
    )
    assert len(batched) == 5
    for path, dets in zip(paths, batched):
        single = engine.predict(path, conf_threshold=0.0, nms_threshold=0.4)
        assert len(dets) == len(single)
        for a, b in zip(dets, single):
            assert a.class_id == b.class_id
            assert a.confidence == pytest.approx(b.confidence, abs=1e-5)
            assert a.bbox.x == pytest.approx(b.bbox.x, abs=1e-5)
            assert a.bbox.y == pytest.approx(b.bbox.y, abs=1e-5)


def test_schema_validation():
    with pytest.raises(Exception):
        BoundingBox(x=1.5, y=0.5, width=0.2, height=0.2)
    with pytest.raises(Exception):
        Detection(class_id=-1, confidence=0.5,
                  bbox=BoundingBox(x=0.5, y=0.5, width=0.1, height=0.1))
    bb = BoundingBox.from_corners(0.2, 0.2, 0.6, 0.8)
    assert bb.x == pytest.approx(0.4)
    assert bb.area == pytest.approx(0.4 * 0.6)
    # Exact binary fractions: int() truncation in to_pixel_coords matches the
    # reference's semantics, so 0.2+0.6/2-0.3 = 0.19999... would floor to 19.
    bb2 = BoundingBox.from_corners(0.25, 0.25, 0.75, 0.75)
    assert bb2.to_pixel_coords(100, 100) == (25, 25, 75, 75)
