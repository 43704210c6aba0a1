#!/usr/bin/env python
"""Host data-loader throughput: thread pool vs spawned process pool.

The reference feeds training with 32 DataLoader worker *processes*
(/root/reference/src/train.py:127-141). This measures our DataLoader's two
backends on the same synthetic-VOC augmented workload so the worker_type
choice for a given host is a number, not a guess:

    python tools/bench_loader.py [--images 64] [--workers 4] [--batch 8]

Single-core hosts (like this dev VM) should expect processes to LOSE —
spawn + per-batch pickle IPC with no parallel cores to pay for it; the
reference's setting only pays off on multi-core training hosts.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_voc_tree(root: Path, n_images: int) -> None:
    from PIL import Image

    voc = root / "VOCdevkit" / "VOC2007"
    (voc / "JPEGImages").mkdir(parents=True, exist_ok=True)
    (voc / "Annotations").mkdir(parents=True, exist_ok=True)
    (voc / "ImageSets" / "Main").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    ids = []
    xml = (
        "<annotation><size><width>500</width><height>375</height>"
        "<depth>3</depth></size><object><name>dog</name><bndbox>"
        "<xmin>40</xmin><ymin>30</ymin><xmax>300</xmax><ymax>280</ymax>"
        "</bndbox></object></annotation>"
    )
    for k in range(n_images):
        img_id = f"{k:06d}"
        ids.append(img_id)
        Image.fromarray(
            rng.integers(0, 255, (375, 500, 3), dtype=np.uint8), "RGB"
        ).save(voc / "JPEGImages" / f"{img_id}.jpg", quality=85)
        (voc / "Annotations" / f"{img_id}.xml").write_text(xml)
    (voc / "ImageSets" / "Main" / "train.txt").write_text("\n".join(ids))


def run(loader, epochs: int) -> float:
    n = 0
    t0 = time.perf_counter()
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        for images, _ in loader:
            n += images.shape[0]
    return n / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    import os
    import tempfile

    from yolo_tpu.data import DataLoader, VOCDetectionYOLO

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        make_voc_tree(root, args.images)
        ds = VOCDetectionYOLO(root=root, year="2007", image_set="train",
                              augment=True, normalize_host=False)
        print(f"host CPUs: {os.cpu_count()}; {args.images} images, "
              f"{args.workers} workers, batch {args.batch}, "
              f"{args.epochs} epochs (augmented, uint8 wire)")
        for worker_type in ("thread", "process"):
            loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                                num_workers=args.workers,
                                worker_type=worker_type)
            try:
                # Warm epoch outside the clock (spawn/import cost for the
                # process pool; page cache for both).
                loader.set_epoch(10_000)  # warm epoch (seeds must be >= 0)
                for _ in loader:
                    pass
                rate = run(loader, args.epochs)
            finally:
                loader.close()
            print(f"  {worker_type:>7}: {rate:8.1f} samples/s")


if __name__ == "__main__":
    main()
