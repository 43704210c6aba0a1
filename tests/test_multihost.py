"""Executed 2-process ``jax.distributed`` gate (opt-in wrapper).

Runs ``tools/multihost_gate.py`` — two coordinated CPU processes (2 virtual
devices each) executing the PRODUCTION train step over a global (data=2,
model=2) mesh whose 'data' axis crosses the process boundary, the sharded
DataLoader's per-process slicing, ``put_sharded``'s
``make_array_from_process_local_data`` branch, and ``mAPMetric``'s
``process_allgather`` — then asserts both processes computed identical
losses and identical full-dataset mAP (nonzero, all images covered).

This is the executed coverage for every ``jax.process_count() > 1`` branch
(the branches the reference has no counterpart for — its distributed story
is a Modal ``.remote()`` dispatch, reference src/train.py:346-349).

Opt-in: ``YOLO_TPU_RUN_SLOW=1 python -m pytest tests/test_multihost.py``
(measured ~100 s wall on the 1-core host, round 5 — two concurrent child
compiles of the few-ops probe model; recorded result in PARITY.md).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("YOLO_TPU_RUN_SLOW"),
    reason="2-process distributed gate spawns two compiling children "
    "(~2 min on 1-core hosts); set YOLO_TPU_RUN_SLOW=1 to run",
)


def test_two_process_distributed_gate():
    repo_root = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    # Children pin their own platform/devices; the parent env must not leak
    # the test harness's 8-device flag into them.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(repo_root / "tools" / "multihost_gate.py"),
         "--timeout", "850"],
        capture_output=True, text=True, timeout=900, cwd=repo_root, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"] is True
    assert summary["agree"] is True
    assert summary["covered_all_images"] is True
    assert summary["recall"] > 0  # gathered set contains real TPs
