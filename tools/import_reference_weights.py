#!/usr/bin/env python
"""Import the reference's published weights and reproduce its headline mAP.

One command that settles the mAP gate the moment network/data exist
(BASELINE.md:31-33: VOC2007-test mAP@0.5 within 0.5 pt of 43.87%):

    python tools/import_reference_weights.py --data-root ./data

Steps (each skipped cleanly when its prerequisite is unavailable):
1. Download ``yolo_best.pth`` from HF ``mattiaskvist/yolo-v1``
   (reference README.md:62,130) — or use ``--pth`` for a local copy.
2. Convert to our variables via ``yolo_tpu.convert.load_pth_checkpoint``
   (OIHW->HWIO, NCHW->NHWC FC re-indexing; forward parity pinned by
   tools/parity_check.py::check_model_forward).
3. Evaluate on PASCAL VOC 2007 test (4,952 images) with the reference's
   eval settings (conf 0.01, NMS 0.4).
4. Assert |mAP50 - 43.87| <= 0.5 (and report mAP50:95 / mAP75 /
   precision / recall vs the reference README table).

``--dry-run`` exercises the full code path offline with a synthetic
reference-layout .pth and synthetic VOC images (no assertions on mAP).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Reference README.md:40-44 (published on VOC2007 test).
REFERENCE_METRICS = {
    "mAP50:95": 0.2120,
    "mAP50": 0.4387,
    "mAP75": 0.1433,
    "precision": 0.1747,
    "recall": 0.5227,
}
MAP50_TOLERANCE = 0.005  # 0.5 percentage points (BASELINE.md:31-33)

HF_REPO = "mattiaskvist/yolo-v1"
HF_FILE = "yolo_best.pth"


def download_checkpoint(dest_dir: Path) -> Path | None:
    """Fetch yolo_best.pth from HF; None when offline/unavailable."""
    dest = dest_dir / HF_FILE
    if dest.exists():
        print(f"Using cached checkpoint {dest}")
        return dest
    try:
        from huggingface_hub import hf_hub_download

        path = hf_hub_download(HF_REPO, HF_FILE, local_dir=str(dest_dir))
        return Path(path)
    except Exception as exc:  # offline, missing hub, auth, ...
        print(f"SKIP download: {type(exc).__name__}: {exc}")
        return None


def make_synthetic_pth(path: Path) -> Path:
    """Write a reference-layout .pth (random weights) for --dry-run."""
    import torch

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from parity_check import _build_torch_resnet50, _stub_torchvision

    _stub_torchvision()
    sys.path.insert(0, "/root/reference/src")
    try:
        from yolo.models import DetectionHead as RefHead
    except ImportError:  # reference not mounted: minimal stand-in head
        RefHead = None

    resnet = _build_torch_resnet50(torch)
    if RefHead is None:
        raise SystemExit("--dry-run needs /root/reference mounted for the head")
    head = RefHead(2048)

    class Flagship(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = torch.nn.Module()
            self.backbone.extractor = torch.nn.Sequential(
                resnet.conv1, resnet.bn1, resnet.relu, resnet.maxpool,
                resnet.layer1, resnet.layer2, resnet.layer3, resnet.layer4,
            )
            self.head = head

    torch.save(
        {"model_state_dict": Flagship().state_dict(), "epoch": 135,
         "val_loss": 2.5, "mAP50": 0.4387},
        path,
    )
    print(f"Wrote synthetic reference-layout checkpoint -> {path}")
    return path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--pth", default=None,
                        help="local yolo_best.pth (skips the HF download)")
    parser.add_argument("--data-root", default="./data")
    parser.add_argument("--download-data", action="store_true",
                        help="kagglehub-download VOC if missing")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--dry-run", action="store_true",
                        help="synthetic weights + whatever VOC data exists; "
                             "exercises the full path, no mAP assertion")
    parser.add_argument("--cache-dir", default="checkpoints")
    args = parser.parse_args(argv)

    from yolo_tpu.utils.platform import (
        respect_jax_platforms_env,
        setup_compilation_cache,
    )

    respect_jax_platforms_env()
    setup_compilation_cache()

    cache_dir = Path(args.cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)

    # 1. Weights.
    if args.dry_run and not args.pth:
        pth = make_synthetic_pth(cache_dir / "yolo_best_synthetic.pth")
    elif args.pth:
        pth = Path(args.pth)
    else:
        pth = download_checkpoint(cache_dir)
        if pth is None:
            print("No network and no --pth: nothing to import. "
                  "Re-run with network access or --dry-run.")
            return 0

    # 2 + 3. Convert and evaluate through the standard CLI path (the same
    # loader/evaluator users run), so this is a real end-to-end rehearsal.
    # Import by file path: a bare ``import evaluate`` resolves to the HF
    # ``evaluate`` package when running from tools/.
    import importlib.util

    repo_root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "yolo_evaluate_cli", repo_root / "evaluate.py"
    )
    evaluate_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate_cli)

    eval_args = [
        "--checkpoint", str(pth),
        "--data-root", args.data_root,
        "--batch-size", str(args.batch_size),
        "--num-workers", str(args.num_workers),
        "--year", "2007", "--image-set", "test",
    ]
    if args.download_data:
        eval_args.append("--download-data")
    try:
        results = evaluate_cli.main(eval_args)
    except FileNotFoundError as exc:
        print(f"SKIP evaluation (dataset unavailable): {exc}")
        return 0

    # 4. Gate.
    print("\n==== Published-weights reproduction ====")
    for key, ref in REFERENCE_METRICS.items():
        got = results.get(key, float("nan"))
        print(f"  {key:10s}: ours {got * 100:6.2f}%  reference {ref * 100:6.2f}%"
              f"  Δ {abs(got - ref) * 100:+.2f} pt")
    if args.dry_run:
        print("DRY-RUN OK: full import->convert->evaluate path exercised")
        return 0
    delta = abs(results["mAP50"] - REFERENCE_METRICS["mAP50"])
    if delta <= MAP50_TOLERANCE:
        print(f"MAP GATE: PASS (|Δ mAP50| = {delta * 100:.2f} pt <= 0.5)")
        return 0
    print(f"MAP GATE: FAIL (|Δ mAP50| = {delta * 100:.2f} pt > 0.5)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
