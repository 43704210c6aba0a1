"""Executed FLAGSHIP-ResNet50 DP train step on a 2-device mesh (opt-in).

The standard multichip gate (``__graft_entry__.dryrun_multichip``) executes
the production train step with a compute-light probe backbone, because on
1-core fleet VMs XLA:CPU's idle Eigen workers busy-spin during collective
rendezvous and an 8-virtual-device ResNet step measured 684 s (CLAUDE.md
trap 7). This test closes the remaining gap — real BACKBONE collectives
executed on a mesh — by running the full (3,4,6,3)-ResNet50 step pure-DP
on only TWO virtual devices (one spinning worker instead of seven) in a
clean subprocess, at 64² with a fresh hermetic compile cache.

Opt-in: ``YOLO_TPU_RUN_SLOW=1 python -m pytest tests/test_flagship_mesh.py``
(measured 69.5 s wall incl. compile on the 1-core host, round 4; the
gate's own in-process collective terminate deadline of 1200 s still bounds
a genuinely stuck all-reduce).

Recorded result (round 4, this host): see PARITY.md "Executed mesh
coverage" bullet.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("YOLO_TPU_RUN_SLOW"),
    reason="executed 2-device ResNet DP step is minutes-slow on 1-core "
    "hosts; set YOLO_TPU_RUN_SLOW=1 to run",
)


def test_flagship_resnet50_dp_step_on_2_devices():
    repo_root = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # dryrun sets the 2-device flag itself
    env.update(
        JAX_PLATFORMS="cpu",
        YOLO_TPU_DRYRUN_BACKBONE="resnet50",
        YOLO_TPU_DRYRUN_MODEL_AXIS="1",  # pure data-parallel mesh (2, 1)
    )
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=repo_root,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n"
        f"{proc.stderr[-4000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout
    assert "{'data': 2, 'model': 1}" in proc.stdout, (
        f"expected a (2,1) DP mesh in output:\n{proc.stdout}"
    )
