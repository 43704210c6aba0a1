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

    Also relaxes XLA:CPU's collective-rendezvous deadlines when running a
    forced multi-device CPU mesh on a host with fewer cores than devices:
    the virtual devices' compute serializes, the slowest participant can
    miss the default 40 s deadline, and the runtime CHECK-fails the whole
    process (observed on a 1-core VM with an 8-device test mesh, killing
    training at the first gradient all-reduce). Correctness runs don't care
    about step latency, so give the rendezvous room instead.
    """
    value = os.environ.get("JAX_PLATFORMS")
    if not value:
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if (
        "cpu" in value
        and "xla_force_host_platform_device_count" in flags
        and "collective_call_terminate" not in flags
    ):
        try:
            n_dev = int(flags.split("xla_force_host_platform_device_count=")[1]
                        .split()[0])
        except (IndexError, ValueError):
            n_dev = 0
        if (os.cpu_count() or 1) < n_dev:
            os.environ["XLA_FLAGS"] = flags + (
                " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
            )
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
