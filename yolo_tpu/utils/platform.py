"""Platform selection helpers.

Some managed environments install a sitecustomize that re-pins
``jax_platforms`` at interpreter startup, silently overriding the standard
``JAX_PLATFORMS`` environment variable. The CLIs call
:func:`respect_jax_platforms_env` before first backend use so the documented
JAX env-var contract holds (e.g. ``JAX_PLATFORMS=cpu python train.py ...``
really runs on CPU).
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    """Re-assert the user's JAX_PLATFORMS env var over sitecustomize pins.

    No-op when the variable is unset or a backend is already initialized.
    """
    value = os.environ.get("JAX_PLATFORMS")
    if not value:
        return
    import jax

    try:
        jax.config.update("jax_platforms", value)
    except Exception:
        pass  # backend already initialized; too late to switch


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache for CLI runs.

    The 448^2 ResNet50 train/eval graphs take minutes to compile; caching
    them across processes makes re-runs (resume, evaluate-after-train)
    near-instant. Override the location with YOLO_TPU_XLA_CACHE.
    """
    import jax

    cache_dir = path or os.environ.get(
        "YOLO_TPU_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "yolo_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
