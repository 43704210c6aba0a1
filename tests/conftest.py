"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-device behavior is tested the TPU-native way: a virtual 8-device CPU
platform via XLA_FLAGS (the reference has no distributed tests at all —
SURVEY.md §4).
"""

import os

# Force CPU unconditionally: the harness environment pre-sets
# JAX_PLATFORMS=axon (a remote-attached TPU), where eager per-op dispatch
# makes unit tests take ~25 minutes EACH. The test suite is defined to run on
# the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

# Persistent XLA compilation cache: amortizes conv-graph compiles across test
# processes (the dominant cost of the model tests on the CPU mesh).
import jax

# The env-var route above is NOT sufficient here: the harness's
# sitecustomize.py imports jax at interpreter startup (before conftest), and
# jax captures JAX_PLATFORMS into jax.config at import time. Updating the
# config directly works as long as no backend has initialized yet.
jax.config.update("jax_platforms", "cpu")

# Machine-keyed cache dir: XLA:CPU persists AOT machine code, and a blob
# compiled on a host with different CPU features SIGILLs/errors when loaded
# (killed the round-2 multichip gate). Load the helper by file path to avoid
# importing the full package (matplotlib etc.) at conftest time.
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "_yolo_tpu_platform",
    os.path.join(os.path.dirname(__file__), "..", "yolo_tpu", "utils",
                 "platform.py"),
)
_platform_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_platform_mod)

jax.config.update(
    "jax_compilation_cache_dir", _platform_mod.machine_cache_dir("/tmp/jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
