"""Package version (mirrors reference src/yolo/__init__.py:15)."""

__version__ = "0.1.0"
