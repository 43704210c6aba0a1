"""respect_jax_platforms_env: XLA flag augmentation for forced CPU meshes.

The collective-rendezvous deadline relaxation (utils/platform.py) only fires
for a forced multi-device CPU mesh on a host with fewer cores than devices —
the configuration where XLA:CPU's default 40 s deadline CHECK-failed training
(observed on the 1-core verify host).
"""

import os
from unittest import mock

from yolo_tpu.utils import platform


def _flags_after(env):
    with mock.patch.dict(os.environ, env, clear=False):
        for k in ("JAX_PLATFORMS", "XLA_FLAGS"):
            if k not in env:
                os.environ.pop(k, None)
        platform.respect_jax_platforms_env()
        return os.environ.get("XLA_FLAGS", "")


def test_relaxes_deadline_for_oversubscribed_cpu_mesh():
    with mock.patch("os.cpu_count", return_value=1):
        flags = _flags_after({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        })
    assert "collective_call_terminate_timeout_seconds=1200" in flags
    assert "collective_call_warn_stuck_timeout_seconds=300" in flags


def test_no_change_when_cores_suffice():
    with mock.patch("os.cpu_count", return_value=16):
        flags = _flags_after({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        })
    assert "collective_call_terminate" not in flags


def test_no_change_without_forced_device_count():
    with mock.patch("os.cpu_count", return_value=1):
        flags = _flags_after({"JAX_PLATFORMS": "cpu"})
    assert "collective_call_terminate" not in flags


def test_existing_user_setting_wins():
    with mock.patch("os.cpu_count", return_value=1):
        flags = _flags_after({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8 "
                         "--xla_cpu_collective_call_terminate_timeout_seconds=77",
        })
    assert flags.count("collective_call_terminate") == 1
    assert "=77" in flags


def test_partial_user_setting_fills_only_the_missing_flag():
    """ADVICE r2 #4: a user who pre-set only ONE flag of the pair must keep
    their value AND get the other appended exactly once."""
    with mock.patch("os.cpu_count", return_value=1):
        flags = _flags_after({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8 "
                         "--xla_cpu_collective_call_warn_stuck_timeout_seconds=9",
        })
    assert flags.count("collective_call_warn_stuck") == 1
    assert "warn_stuck_timeout_seconds=9" in flags
    assert flags.count("collective_call_terminate") == 1


def test_machine_cache_dir_is_stable_and_keyed():
    """XLA:CPU AOT blobs are machine-code; the cache dir must differ across
    CPU types but be deterministic on one host (r2 multichip-gate fix)."""
    a = platform.machine_cache_dir("/tmp/base")
    b = platform.machine_cache_dir("/tmp/base/")
    assert a == b
    assert a.startswith("/tmp/base-")
    suffix = a.rsplit("-", 1)[1]
    assert len(suffix) == 12 and all(c in "0123456789abcdef" for c in suffix)


def test_append_flag_once():
    f = platform._append_flag_once("", "--x=1")
    assert f == "--x=1"
    f = platform._append_flag_once(f, "--x=2")
    assert f == "--x=1"
    f = platform._append_flag_once(f, "--y=3")
    assert f == "--x=1 --y=3"


def test_machine_fingerprint_discriminates_cpu_model(tmp_path):
    """Two hosts with IDENTICAL hypervisor-normalized flag sets but
    different CPUID models must get different fingerprints: LLVM derives
    AOT tuning features (+prefer-no-gather etc.) from the CPU model, and a
    flags-only key loaded SIGILL-class foreign XLA:CPU blobs twice on the
    fleet (rounds 2 and 3)."""
    flags = "flags\t\t: fpu avx avx2 avx512f sse sse2"
    icelake = tmp_path / "icelake"
    icelake.write_text(
        "vendor_id\t: GenuineIntel\ncpu family\t: 6\nmodel\t\t: 106\n"
        f"stepping\t: 6\nmodel name\t: Intel(R) Xeon(R) Processor\n{flags}\n"
    )
    spr = tmp_path / "sapphirerapids"
    spr.write_text(
        "vendor_id\t: GenuineIntel\ncpu family\t: 6\nmodel\t\t: 143\n"
        f"stepping\t: 8\nmodel name\t: Intel(R) Xeon(R) Processor\n{flags}\n"
    )
    a = platform.machine_fingerprint(cpuinfo_path=str(icelake))
    b = platform.machine_fingerprint(cpuinfo_path=str(spr))
    assert a != b
    # Same file -> stable.
    assert a == platform.machine_fingerprint(cpuinfo_path=str(icelake))


def test_machine_fingerprint_discriminates_raw_cpuid(tmp_path):
    """Hosts whose /proc/cpuinfo is IDENTICAL (hypervisor-normalized brand
    string AND aliased flags — the observed fleet case) must still get
    different fingerprints when the raw CPUID leaves differ: CPUID is what
    LLVM's host detection executes, so it is the discriminator that decides
    AOT tuning features."""
    info = tmp_path / "cpuinfo"
    info.write_text(
        "vendor_id\t: GenuineIntel\ncpu family\t: 6\nmodel\t\t: 143\n"
        "stepping\t: 8\nmodel name\t: Intel(R) Xeon(R) Processor @ 2.70GHz\n"
        "flags\t\t: fpu avx avx2 avx512f sse sse2\n"
    )
    a = platform.machine_fingerprint(cpuinfo_path=str(info),
                                     cpuid="1.0:000806f8,...")
    b = platform.machine_fingerprint(cpuinfo_path=str(info),
                                     cpuid="1.0:000606a6,...")
    assert a != b
    assert a == platform.machine_fingerprint(cpuinfo_path=str(info),
                                             cpuid="1.0:000806f8,...")


def test_cpuid_identity_real_host():
    """On x86-64 the CPUID thunk returns plausible leaves (vendor leaf 0
    present, stable across calls); elsewhere it returns ''."""
    import platform as stdlib_platform

    cid = platform._cpuid_identity()
    if stdlib_platform.machine() != "x86_64":
        assert cid == ""
        return
    if not cid:  # executable-page mmap may be blocked in a sandbox
        return
    assert cid.startswith("0.0:")
    assert cid == platform._cpuid_identity()


def test_tpu_compiler_options_per_graph_and_override():
    """Per-graph scoped-VMEM optima (int8 64 MiB / bf16 96 MiB, round-5
    sweeps in PARITY.md) apply only on TPU-class backends; the env knob
    overrides or disables both."""
    with mock.patch("jax.default_backend", return_value="cpu"):
        assert platform.tpu_compiler_options() == {}
        assert platform.tpu_compiler_options("bf16") == {}
    with mock.patch("jax.default_backend", return_value="tpu"):
        with mock.patch.dict(os.environ, {}, clear=False):
            os.environ.pop("YOLO_TPU_SCOPED_VMEM_KIB", None)
            assert platform.tpu_compiler_options() == {
                "xla_tpu_scoped_vmem_limit_kib": "65536"
            }
            assert platform.tpu_compiler_options("int8") == {
                "xla_tpu_scoped_vmem_limit_kib": "65536"
            }
            assert platform.tpu_compiler_options("bf16") == {
                "xla_tpu_scoped_vmem_limit_kib": "98304"
            }
            # Unknown graph families fall back to the int8 default.
            assert platform.tpu_compiler_options("other") == {
                "xla_tpu_scoped_vmem_limit_kib": "65536"
            }
        with mock.patch.dict(
            os.environ, {"YOLO_TPU_SCOPED_VMEM_KIB": "32768"}, clear=False
        ):
            assert platform.tpu_compiler_options("bf16") == {
                "xla_tpu_scoped_vmem_limit_kib": "32768"
            }
        with mock.patch.dict(
            os.environ, {"YOLO_TPU_SCOPED_VMEM_KIB": "0"}, clear=False
        ):
            assert platform.tpu_compiler_options() == {}
