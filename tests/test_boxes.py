"""Box geometry op tests (IoU identity/disjoint/partial/symmetry), mirroring
the reference's IoU test coverage (tests/test_yolo.py:196-227,
tests/test_metrics.py:35-55)."""

import jax.numpy as jnp
import numpy as np

from yolo_tpu.ops.boxes import (
    box_area,
    center_to_corners,
    corners_to_center,
    iou_cellwise,
    iou_pairwise,
)


def test_center_corner_roundtrip():
    boxes = jnp.array([[0.5, 0.5, 0.2, 0.4], [0.1, 0.9, 0.05, 0.1]])
    corners = center_to_corners(boxes)
    np.testing.assert_allclose(
        corners[0], [0.4, 0.3, 0.6, 0.7], atol=1e-7
    )
    back = corners_to_center(corners)
    np.testing.assert_allclose(back, boxes, atol=1e-7)


def test_iou_identical_boxes():
    box = jnp.array([0.5, 0.5, 0.2, 0.2])
    iou = iou_cellwise(box, box)
    assert abs(float(iou) - 1.0) < 1e-4


def test_iou_disjoint_boxes():
    a = jnp.array([0.2, 0.2, 0.1, 0.1])
    b = jnp.array([0.8, 0.8, 0.1, 0.1])
    assert float(iou_cellwise(a, b)) == 0.0


def test_iou_partial_overlap():
    # Two unit-offset half-overlapping boxes: inter 0.5*1, union 1.5 -> 1/3.
    a = jnp.array([0.5, 0.5, 1.0, 1.0])
    b = jnp.array([1.0, 0.5, 1.0, 1.0])
    np.testing.assert_allclose(float(iou_cellwise(a, b)), 1 / 3, atol=1e-4)


def test_iou_symmetry():
    a = jnp.array([0.4, 0.4, 0.3, 0.2])
    b = jnp.array([0.5, 0.45, 0.25, 0.35])
    assert abs(float(iou_cellwise(a, b)) - float(iou_cellwise(b, a))) < 1e-7


def test_iou_pairwise_shape_and_values():
    a = jnp.array([[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]])
    b = jnp.array(
        [[0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1], [0.1, 0.1, 0.1, 0.1]]
    )
    m = iou_pairwise(a, b)
    assert m.shape == (2, 3)
    assert abs(float(m[0, 0]) - 1.0) < 1e-4
    assert float(m[0, 1]) == 0.0
    assert abs(float(m[1, 2]) - 1.0) < 1e-4


def test_zero_area_box_iou():
    # Mirrors reference edge case (tests/test_metrics.py:208-222).
    zero = jnp.array([0.5, 0.5, 0.0, 0.0])
    normal = jnp.array([0.5, 0.5, 0.2, 0.2])
    assert float(iou_cellwise(zero, normal)) == 0.0
    assert float(iou_cellwise(zero, zero)) == 0.0
    assert float(box_area(zero)) == 0.0
