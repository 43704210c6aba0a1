"""Platform selection helpers.

Some managed environments install a sitecustomize that re-pins
``jax_platforms`` at interpreter startup, silently overriding the standard
``JAX_PLATFORMS`` environment variable. The CLIs call
:func:`respect_jax_platforms_env` before first backend use so the documented
JAX env-var contract holds (e.g. ``JAX_PLATFORMS=cpu python train.py ...``
really runs on CPU).
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform


def machine_fingerprint(cpuinfo_path: str = "/proc/cpuinfo") -> str:
    """Short stable hash of this host's CPU microarchitecture.

    XLA:CPU's persistent cache stores AOT-compiled machine code keyed only by
    the HLO — a blob compiled on an AVX-512 host is happily loaded on a host
    without those features and dies with "Target machine feature ... is not
    supported on the host machine" (observed killing the round-2 multichip
    gate when /tmp/jax_cache survived across heterogeneous fleet hosts).
    Keying every cache directory by this fingerprint makes caches hermetic
    per machine type while staying warm across runs on the same machine.

    The fingerprint must include the CPUID identity (vendor/family/model/
    stepping), not just the feature flags: LLVM derives tuning features such
    as ``+prefer-no-gather`` from the detected CPU *model* (e.g. Sapphire
    Rapids vs Ice Lake), so two fleet hosts with identical hypervisor-
    normalized flag sets can still produce mutually SIGILL-class-incompatible
    AOT blobs (observed round 3: a flags-only fingerprint collided across
    such hosts and re-poisoned the multichip gate).
    """
    keys = ("vendor_id", "cpu family", "model", "stepping", "model name",
            "flags", "Features")
    ident = []
    try:
        with open(cpuinfo_path) as fh:
            seen = set()
            for line in fh:
                k = line.split(":", 1)[0].strip()
                if k in keys and k not in seen:
                    seen.add(k)
                    v = line.split(":", 1)[1].strip()
                    if k in ("flags", "Features"):
                        v = " ".join(sorted(v.split()))
                    ident.append(f"{k}={v}")
                if len(seen) == len(keys):
                    break
    except OSError:
        pass
    raw = f"{_platform.machine()}|{'|'.join(ident)}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def machine_cache_dir(base: str) -> str:
    """Machine-keyed compilation-cache path: ``{base}-{fingerprint}``."""
    return f"{base.rstrip('/')}-{machine_fingerprint()}"


def _append_flag_once(flags: str, flag: str) -> str:
    """Append ``flag`` ('--name=value') unless --name is already present."""
    name = flag.split("=", 1)[0]
    if name in flags:
        return flags
    return f"{flags} {flag}".strip()


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
    if "cpu" in value and "xla_force_host_platform_device_count" in flags:
        try:
            n_dev = int(flags.split("xla_force_host_platform_device_count=")[1]
                        .split()[0])
        except (IndexError, ValueError):
            n_dev = 0
        if (os.cpu_count() or 1) < n_dev:
            # Guard each flag individually: a user who pre-set only one of
            # the pair must not get it appended again with another value.
            flags = _append_flag_once(
                flags,
                "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300",
            )
            flags = _append_flag_once(
                flags,
                "--xla_cpu_collective_call_terminate_timeout_seconds=1200",
            )
            os.environ["XLA_FLAGS"] = flags
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
        machine_cache_dir(
            os.path.join(os.path.expanduser("~"), ".cache", "yolo_tpu_xla")
        ),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
