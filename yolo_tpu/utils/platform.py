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


def _cpuid_identity() -> str:
    """Raw CPUID identity — what LLVM's host detection actually executes.

    The fleet's hypervisor normalizes ``/proc/cpuinfo`` (generic brand
    string, aliased flag sets) across physically different CPUs, but the
    CPUID *instruction* — which llvm::sys::getHostCPUName/Features run —
    still differs there, and that is what decides SIGILL-class tuning
    features like ``+prefer-no-gather`` inside XLA:CPU AOT blobs (observed
    round 3: a cpuinfo-only fingerprint collided across hosts whose
    compiled feature sets differed, re-surfacing the foreign-blob loads).
    Executes CPUID through a tiny executable-page thunk; returns "" on
    non-x86-64 or any failure (the cpuinfo fields still apply).
    """
    if _platform.machine() != "x86_64":
        return ""
    try:
        import ctypes
        import mmap

        # SysV x86-64: edi=leaf, esi=subleaf, rdx=out[4] (u32 eax..edx).
        code = bytes(
            [
                0x53,                    # push rbx (callee-saved, cpuid clobbers)
                0x49, 0x89, 0xD0,        # mov r8, rdx (cpuid clobbers edx)
                0x89, 0xF8,              # mov eax, edi
                0x89, 0xF1,              # mov ecx, esi
                0x0F, 0xA2,              # cpuid
                0x41, 0x89, 0x00,        # mov [r8], eax
                0x41, 0x89, 0x58, 0x04,  # mov [r8+4], ebx
                0x41, 0x89, 0x48, 0x08,  # mov [r8+8], ecx
                0x41, 0x89, 0x50, 0x0C,  # mov [r8+12], edx
                0x5B,                    # pop rbx
                0xC3,                    # ret
            ]
        )
        buf = mmap.mmap(
            -1, len(code),
            prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC,
        )
        buf.write(code)
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        regs = (ctypes.c_uint32 * 4)()
        fn = ctypes.CFUNCTYPE(
            None, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32 * 4),
        )(addr)
        out = []
        # Vendor, signature+features, structured-extended features (both
        # subleaves), and the extended feature leaf: the inputs LLVM's CPU
        # subtype + feature detection reads.
        for leaf, sub in ((0, 0), (1, 0), (7, 0), (7, 1), (0x80000001, 0)):
            fn(leaf, sub, ctypes.byref(regs))
            out.append(f"{leaf:x}.{sub:x}:" + ",".join(f"{r:08x}" for r in regs))
        del fn
        buf.close()
        return ";".join(out)
    except Exception:  # noqa: BLE001 — fingerprint must never raise
        return ""


def machine_fingerprint(cpuinfo_path: str = "/proc/cpuinfo",
                        cpuid: str | None = None) -> str:
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
    such hosts and re-poisoned the multichip gate). And because the
    hypervisor normalizes /proc/cpuinfo itself (generic brand string), the
    raw CPUID leaves are mixed in too (``_cpuid_identity``) — they are what
    LLVM actually reads, and the only host-visible discriminator left.
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
    if cpuid is None:
        cpuid = _cpuid_identity()
    raw = f"{_platform.machine()}|{'|'.join(ident)}|{cpuid}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def machine_cache_dir(base: str) -> str:
    """Machine-keyed compilation-cache path: ``{base}-{fingerprint}``."""
    return f"{base.rstrip('/')}-{machine_fingerprint()}"


#: Measured scoped-VMEM optima per shipped graph family (KiB). Round-5
#: flag sweeps (`tools/flag_sweep.py`; matrices in PARITY.md): the int8
#: serving graph has a clean optimum at 64 MiB (60.39 -> 55.69 ms @b256,
#: +8.4%; 72-96 MiB regress), while the bf16 exact graph keeps improving
#: to a flat plateau at 96-128 MiB (103.10 -> 98.72 ms @b256, +4.4%;
#: 96/112/128 within noise — 96 keeps the most compiler headroom). The
#: b128 448^2 train step measured NEUTRAL-or-worse at every ceiling, so
#: the Trainer jit deliberately takes no options.
_SCOPED_VMEM_KIB = {"int8": "65536", "bf16": "98304"}


def tpu_compiler_options(graph: str = "int8") -> dict:
    """Per-jit XLA:TPU compiler options measured to win on the shipped graphs.

    ``graph`` selects the measured scoped-VMEM fusion ceiling: ``"int8"``
    (the serving engine, 64 MiB) or ``"bf16"`` (the exact-parity inference
    graph, 96 MiB) — see ``_SCOPED_VMEM_KIB`` for the receipts. Scheduler,
    fusion-shape, MSA and optimization-level knobs all measured
    neutral-or-worse (PARITY.md flag matrix).

    TPU-only debug options are rejected by other backends' compilers, so
    this returns {} unless the default backend is a TPU (the axon PJRT
    plugin reports 'tpu'; CPU tests/gates stay option-free). Override knob:
    YOLO_TPU_SCOPED_VMEM_KIB=0 disables, any other value replaces the
    per-graph default.
    """
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return {}
    if "tpu" not in backend.lower() and "axon" not in backend.lower():
        return {}
    kib = os.environ.get(
        "YOLO_TPU_SCOPED_VMEM_KIB",
        _SCOPED_VMEM_KIB.get(graph, _SCOPED_VMEM_KIB["int8"]),
    )
    if kib in ("0", ""):
        return {}
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


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

    # Keep the host CPU backend registered alongside a pinned accelerator:
    # jax_platforms ordering makes the FIRST entry the default backend, so
    # appending ",cpu" changes nothing about where jit'd compute runs, but
    # keeps jax.local_devices(backend="cpu") working — the f64 precise mAP
    # path and parity harness depend on it (with JAX_PLATFORMS=axon alone
    # they silently degraded to the f32 on-device fallback).
    if "cpu" not in value.split(","):
        value = f"{value},cpu"
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
