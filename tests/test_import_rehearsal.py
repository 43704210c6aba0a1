"""Offline rehearsal of the real-weights import gate.

Runs ``tools/import_reference_weights.py --dry-run`` end-to-end on synthetic
VOC: synthetic reference-layout ``.pth`` -> ``yolo_tpu.convert`` -> the real
``evaluate.py`` CLI -> report. Keeps the one-command mAP gate
(BASELINE.md:31-33: |Δ mAP50| <= 0.5 pt vs 43.87% once network/data exist)
from rotting between rounds.

Slow (one full 448^2 ResNet50 eval compile on the CPU mesh), so it is
opt-in:  ``YOLO_TPU_RUN_SLOW=1 python -m pytest tests/test_import_rehearsal.py``
"""

import importlib.util
import os
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("YOLO_TPU_RUN_SLOW"),
    reason="slow offline rehearsal; set YOLO_TPU_RUN_SLOW=1 to run",
)


def test_import_dry_run_end_to_end(tmp_path):
    pytest.importorskip("torch")
    if not Path("/root/reference/src").exists():
        pytest.skip("reference repo not mounted at /root/reference")
    from test_data import make_voc_tree

    make_voc_tree(tmp_path / "data", year="2007", split="test", n_images=4)

    repo_root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "import_reference_weights",
        repo_root / "tools" / "import_reference_weights.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rc = mod.main([
        "--dry-run",
        "--data-root", str(tmp_path / "data"),
        "--batch-size", "4",
        "--num-workers", "2",
        "--cache-dir", str(tmp_path / "ck"),
    ])
    assert rc == 0
    # The rehearsal must have gone all the way through the evaluate CLI.
    assert (tmp_path / "ck" / "evaluation_results.txt").exists()
