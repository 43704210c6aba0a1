"""Utility subpackage: visualization helpers."""

from yolo_tpu.utils.visualization import (
    draw_detections,
    draw_objectness_grid_on_image,
    extract_objectness_scores,
    visualize_objectness_grid,
)

__all__ = [
    "draw_detections",
    "draw_objectness_grid_on_image",
    "extract_objectness_scores",
    "visualize_objectness_grid",
]
