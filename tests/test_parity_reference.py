"""Numerical parity vs the reference implementation (when mounted).

Runs the tools/parity_check.py families in-process: loss values + input
gradients, decode+NMS detection sets, the full mAP evaluator key set, and
target encoding — each against the reference code executed directly from
/root/reference. Skipped when the reference or torch is unavailable.
"""

import sys
from pathlib import Path

import pytest

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference repo not mounted"
)
torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from tools import parity_check  # noqa: E402


def test_loss_and_gradient_parity():
    assert parity_check.check_loss(REF_SRC, trials=3)


def test_decode_nms_parity():
    assert parity_check.check_decode_nms(REF_SRC, trials=3)


def test_map_evaluator_parity():
    assert parity_check.check_map(REF_SRC, trials=2)


def test_target_encoding_parity():
    assert parity_check.check_target_encoding(REF_SRC, trials=100)


def test_model_forward_parity():
    # Converted reference weights produce identical forwards. quick=True runs
    # the resolution-flexible cases (DetectionHead at 14² features, resnet50
    # trunk at 128²) — the 448²-hardcoded full-model cases take tens of
    # minutes to compile on the 1-core CPU host and are covered by the
    # standalone `python tools/parity_check.py` run (TPU/axon).
    assert parity_check.check_model_forward(REF_SRC, quick=True)


def test_adversarial_map_parity():
    # 128 images, scores quantized to 1 decimal (sort/NMS/IoU tie storms),
    # dense same-class overlaps, ragged batching — still exact.
    assert parity_check.check_map_adversarial(REF_SRC, num_images=64)
