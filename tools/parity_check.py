#!/usr/bin/env python
"""Numerical parity harness vs the reference PyTorch implementation.

Optional developer tool (NOT part of the CI suite): when the reference repo is
mounted (default /root/reference) and torch is importable, this script loads
the reference modules directly and diffs:

1. loss values + input gradients on random batches (BASELINE config 2)
2. decode + NMS detection sets on random prediction grids
3. target encoding on random annotation boxes

Run: python tools/parity_check.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _stub_torchvision() -> None:
    """Stub the torchvision modules the reference package imports at
    __init__ time; the loss/inference modules under test never touch them."""
    import types

    if "torchvision" in sys.modules:
        return
    sys.modules["torchvision"] = types.ModuleType("torchvision")

    class _Any:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return None

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):
            return _Any

    for name in ("torchvision.transforms", "torchvision.transforms.v2",
                 "torchvision.models", "torchvision.datasets",
                 "torchvision.tv_tensors"):
        mod = _AnyAttr(name)
        sys.modules[name] = mod
    sys.modules["torchvision.transforms"].v2 = sys.modules[
        "torchvision.transforms.v2"
    ]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].datasets = sys.modules["torchvision.datasets"]
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]


def check_loss(ref_src: Path, trials: int = 5) -> bool:
    import torch

    sys.path.insert(0, str(ref_src))
    _stub_torchvision()
    from yolo.loss import YOLOLoss as RefLoss  # reference module

    import jax
    import jax.numpy as jnp

    from yolo_tpu.ops.loss import yolo_loss

    S, B, C = 7, 2, 20
    ok = True
    rng = np.random.default_rng(0)
    for t in range(trials):
        pred = rng.normal(size=(4, S, S, B * 5 + C)).astype(np.float32)
        target = np.zeros_like(pred)
        # Random objects in random cells.
        for n in range(4):
            for _ in range(rng.integers(0, 6)):
                i, j = rng.integers(0, S, 2)
                target[n, i, j, 0:5] = [*rng.uniform(0, 1, 2), *rng.uniform(0.05, 1, 2), 1.0]
                target[n, i, j, B * 5 + rng.integers(0, C)] = 1.0

        ref = RefLoss(S=S, B=B, C=C)
        tp = torch.tensor(pred, requires_grad=True)
        tt = torch.tensor(target)
        ref_total, ref_dict = ref(tp, tt)
        ref_total.backward()
        ref_grad = tp.grad.numpy()

        with jax.default_matmul_precision("highest"):
            (total, parts), grad = jax.value_and_grad(
                lambda p: yolo_loss(p, jnp.asarray(target), S=S, B=B, C=C),
                has_aux=True,
            )(jnp.asarray(pred))

        dv = abs(float(total) - float(ref_total.detach()))
        dg = np.abs(np.asarray(grad) - ref_grad).max()
        status = "OK " if dv < 1e-4 and dg < 1e-4 else "FAIL"
        ok &= status == "OK "
        print(f"  loss trial {t}: |Δtotal|={dv:.2e} |Δgrad|max={dg:.2e} {status}")
        for key in ("coord", "conf_obj", "conf_noobj", "class"):
            dk = abs(float(parts[key]) - ref_dict[key])
            if dk > 1e-4:
                print(f"    component {key} differs by {dk:.2e}")
                ok = False
    return ok


def check_decode_nms(ref_src: Path, trials: int = 5) -> bool:
    import torch

    sys.path.insert(0, str(ref_src))
    from yolo.inference import YOLOInference as RefInference

    import jax
    import jax.numpy as jnp

    from yolo_tpu.ops.decode import decode_predictions
    from yolo_tpu.ops.nms import batched_nms

    S, B, C = 7, 2, 20

    class _FakeModel:
        def __init__(self):
            self.S, self.B = S, B

    ref = RefInference.__new__(RefInference)
    ref.model = _FakeModel()

    ok = True
    rng = np.random.default_rng(1)
    for t in range(trials):
        pred = rng.uniform(0, 1, size=(S, S, B * 5 + C)).astype(np.float32)
        ref_dets = ref.parse_predictions(torch.tensor(pred), 0.3)
        ref_dets = ref.non_max_suppression(ref_dets, 0.4)
        ref_set = sorted(
            (d.class_id, round(d.confidence, 5), round(d.bbox.x, 5)) for d in ref_dets
        )

        dets = decode_predictions(jnp.asarray(pred)[None], S, B, C, 0.3)
        dets = batched_nms(dets, 0.4)
        keep = np.asarray(dets.valid[0])
        ours = sorted(
            (
                int(dets.class_ids[0, k]),
                round(float(dets.scores[0, k]), 5),
                round(float(dets.boxes[0, k, 0]), 5),
            )
            for k in np.nonzero(keep)[0]
        )
        status = "OK " if ours == ref_set else "FAIL"
        ok &= status == "OK "
        print(f"  decode+nms trial {t}: ref {len(ref_set)} vs ours {len(ours)} {status}")
    return ok


def check_map(ref_src: Path, trials: int = 3) -> bool:
    """Full mAP evaluator parity: random grids + random targets through the
    reference mAPMetric (host Python loops, metrics.py:17-714) vs our
    device-accumulated mAPMetric. Compares every result key."""
    import torch

    sys.path.insert(0, str(ref_src))
    _stub_torchvision()
    from yolo.metrics import mAPMetric as RefMetric

    from yolo_tpu.metrics import mAPMetric

    S, B, C = 7, 2, 20
    ok = True
    rng = np.random.default_rng(2)
    for t in range(trials):
        N = 4
        preds = rng.uniform(0, 1, size=(N, S, S, B * 5 + C)).astype(np.float32)
        targets = np.zeros_like(preds)
        for n in range(N):
            for _ in range(int(rng.integers(1, 7))):
                i, j = rng.integers(0, S, 2)
                targets[n, i, j, 0:5] = [
                    *rng.uniform(0, 1, 2),
                    *rng.uniform(0.02, 0.9, 2),
                    1.0,
                ]
                targets[n, i, j, B * 5 + int(rng.integers(0, C))] = 1.0

        ref = RefMetric(num_classes=C, conf_threshold=0.1, nms_threshold=0.4)
        ref.update(torch.tensor(preds), torch.tensor(targets))
        ref_res = ref.compute()

        ours = mAPMetric(num_classes=C, conf_threshold=0.1, nms_threshold=0.4)
        ours.update(preds, targets)
        our_res = ours.compute()

        worst = 0.0
        worst_key = ""
        for key, rv in ref_res.items():
            if key not in our_res:
                print(f"    missing key {key}")
                ok = False
                continue
            d = abs(float(rv) - float(our_res[key]))
            if d > worst:
                worst, worst_key = d, key
        status = "OK " if worst < 1e-4 else "FAIL"
        ok &= status == "OK "
        print(
            f"  mAP trial {t}: {len(ref_res)} keys, worst |Δ|={worst:.2e}"
            f" ({worst_key}) {status}"
        )
    return ok


def check_target_encoding(ref_src: Path, trials: int = 200) -> bool:
    """Target-encoder parity: random normalized boxes through the reference's
    VOCDetectionYOLO._encode_target (dataset.py:487-532) vs our encode_target,
    including cell collisions ('first wins') and boundary clamping."""
    sys.path.insert(0, str(ref_src))
    _stub_torchvision()
    from yolo.dataset import VOCDetectionYOLO as RefDS

    from yolo_tpu.data.voc import encode_target

    ref_self = RefDS.__new__(RefDS)  # no dataset IO needed for the encoder
    ref_self.S, ref_self.B, ref_self.C = 7, 2, 20

    rng = np.random.default_rng(3)
    worst = 0.0
    for _ in range(trials):
        n = int(rng.integers(0, 8))
        boxes = rng.uniform(0, 1, size=(n, 4)).astype(np.float32)
        boxes[:, 2:] = rng.uniform(0.01, 0.6, size=(n, 2))
        class_ids = rng.integers(0, 20, size=n).tolist()
        ref_t = RefDS._encode_target(
            ref_self, [list(map(float, b)) for b in boxes], class_ids
        ).numpy()
        ours = encode_target(boxes, class_ids, 7, 2, 20)
        worst = max(worst, float(np.abs(ref_t - ours).max()))
    ok = worst < 1e-6
    print(f"  target encoding: {trials} trials, worst |Δ|={worst:.2e}"
          f" {'OK' if ok else 'FAIL'}")
    return ok


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/root/reference")
    args = parser.parse_args()
    ref_src = Path(args.reference) / "src"
    if not ref_src.exists():
        print(f"reference not found at {ref_src}; skipping")
        return 0
    try:
        import torch  # noqa: F401
    except ImportError:
        print("torch not available; skipping")
        return 0

    print("Loss / gradient parity:")
    ok = check_loss(ref_src)
    print("Decode + NMS parity:")
    ok &= check_decode_nms(ref_src)
    print("mAP evaluator parity:")
    ok &= check_map(ref_src)
    print("Target encoding parity:")
    ok &= check_target_encoding(ref_src)
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
