#!/usr/bin/env python
"""Convergence sanity check: memorize a tiny batch end-to-end on the device.

Runs the full flagship training step (ResNet50 backbone, YOLO loss, Adam,
clipping, BN updates) for N steps on one small fixed batch of synthetic
images, then pushes the SAME batch through the full inference + mAP pipeline.
A correct implementation must drive the loss down ~two orders of magnitude
and reach near-perfect mAP50 on the memorized batch — this exercises
model/loss/optimizer/decode/NMS/mAP together in a way unit tests cannot.

Runs anywhere (TPU: ~3 min for 2000 steps; CPU: use --steps 300 --size 112).

Usage: python tools/overfit_check.py [--steps 2000] [--batch 16] [--size 224]
"""

from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--log-every", type=int, default=200)
    args = p.parse_args()

    from yolo_tpu.utils.platform import (
        respect_jax_platforms_env,
        setup_compilation_cache,
    )

    respect_jax_platforms_env()
    setup_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_tpu.metrics import mAPMetric
    from yolo_tpu.models import ResNetBackbone, YOLOv1
    from yolo_tpu.training import Trainer, make_optimizer

    rng = np.random.default_rng(0)
    B, S = args.batch, 7

    # Synthetic images with localized high-contrast squares; one or two
    # objects per image with distinct classes (learnable structure, not pure
    # noise, so convergence reflects fitting rather than raw memorization
    # capacity at tiny step counts).
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
                # Paint the object: a bright class-dependent square.
                x0 = int((cx - w / 2) * args.size)
                y0 = int((cy - h / 2) * args.size)
                x1 = int((cx + w / 2) * args.size)
                y1 = int((cy + h / 2) * args.size)
                images[n, y0:y1, x0:x1, cls % 3] = 2.0

    dtype = jnp.bfloat16
    model = YOLOv1(
        num_classes=20, S=S, B=2,
        backbone=ResNetBackbone(dtype=dtype), dtype=dtype,
    )
    # Decay late so Adam stops oscillating around the memorized optimum.
    tx = make_optimizer(
        args.lr, 0.0,
        milestones_steps=[int(args.steps * 0.6), int(args.steps * 0.85)],
    )
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=args.size)

    dev_images = jnp.asarray(images)
    dev_targets = jnp.asarray(targets)

    first_loss = None
    for step in range(1, args.steps + 1):
        state, parts = trainer._train_step(state, dev_images, dev_targets)
        if step == 1 or step % args.log_every == 0:
            loss = float(parts["total"])
            first_loss = first_loss if first_loss is not None else loss
            print(f"step {step}: loss {loss:.4f}", flush=True)
    final_loss = float(parts["total"])

    metric = mAPMetric(num_classes=20, conf_threshold=0.1, nms_threshold=0.4)
    preds = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        dev_images.astype(dtype),
        train=False,
    )
    metric.update(preds, dev_targets)
    results = metric.compute()

    print(
        f"\nloss {first_loss:.2f} -> {final_loss:.4f}"
        f" ({first_loss / max(final_loss, 1e-9):.0f}x)"
    )
    print(
        f"memorized-batch mAP50 {results['mAP50']:.3f}"
        f" | recall {results['recall']:.3f} | precision {results['precision']:.3f}"
    )
    ok = final_loss < first_loss / 20 and results["mAP50"] > 0.5
    print("CONVERGENCE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
