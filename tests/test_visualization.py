"""Visualization parity tests vs reference src/yolo/utils/visualization.py:34-147.

Pins the `draw_detections` parameter surface (conf_threshold/box_width/
font_size with the reference defaults), legacy-tuple detection acceptance,
and threshold filtering semantics.
"""

import inspect

import numpy as np
from PIL import Image

from yolo_tpu.schemas import BoundingBox, Detection
from yolo_tpu.utils.visualization import (
    draw_detections,
    draw_objectness_grid_on_image,
    extract_objectness_scores,
)


def _det(conf=0.9, class_id=3):
    return Detection(
        class_id=class_id,
        class_name="boat",
        confidence=conf,
        bbox=BoundingBox(x=0.5, y=0.5, width=0.4, height=0.4),
    )


def _blank(size=96):
    return Image.new("RGB", (size, size), (10, 10, 10))


def test_signature_parity_with_reference():
    """Reference visualization.py:34-41 signature: (image, detections,
    class_names=None, conf_threshold=0.5, box_width=3, font_size=20)."""
    sig = inspect.signature(draw_detections)
    params = sig.parameters
    for name in ("image", "detections", "class_names", "conf_threshold",
                 "box_width", "font_size"):
        assert name in params, name
    assert params["conf_threshold"].default == 0.5
    assert params["box_width"].default == 3
    assert params["font_size"].default == 20
    # Positional call order matches the reference's.
    order = list(params)
    assert order[:6] == ["image", "detections", "class_names",
                         "conf_threshold", "box_width", "font_size"]


def test_draw_detections_draws_and_does_not_mutate_input():
    img = _blank()
    before = np.asarray(img).copy()
    out = draw_detections(img, [_det()], conf_threshold=0.5)
    assert out is not img
    np.testing.assert_array_equal(np.asarray(img), before)
    assert np.asarray(out).sum() > before.sum()  # something was drawn


def test_conf_threshold_filters_low_confidence():
    img = _blank()
    out = draw_detections(img, [_det(conf=0.3)], conf_threshold=0.5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    out2 = draw_detections(img, [_det(conf=0.3)], conf_threshold=0.2)
    assert np.asarray(out2).sum() > np.asarray(img).sum()


def test_legacy_tuple_detections_accepted():
    """Reference docstring format: (class_id, confidence, x, y, w, h)."""
    img = _blank()
    legacy = [(3, 0.9, 0.5, 0.5, 0.4, 0.4)]
    out_t = draw_detections(img, legacy, ["c%d" % i for i in range(20)])
    out_d = draw_detections(img, [Detection(
        class_id=3, confidence=0.9,
        bbox=BoundingBox(x=0.5, y=0.5, width=0.4, height=0.4))],
        ["c%d" % i for i in range(20)])
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_d))


def test_box_width_changes_rendering():
    img = _blank()
    thin = np.asarray(draw_detections(img, [_det()], box_width=1))
    thick = np.asarray(draw_detections(img, [_det()], box_width=5))
    assert (thick != np.asarray(img)).sum() > (thin != np.asarray(img)).sum()


def test_objectness_helpers_smoke():
    pred = np.random.default_rng(0).uniform(size=(1, 7, 7, 30)).astype(np.float32)
    scores = extract_objectness_scores(pred)
    assert scores.shape == (7, 7)
    out = draw_objectness_grid_on_image(_blank(224), pred)
    assert out.size == (224, 224)
