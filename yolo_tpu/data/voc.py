"""PASCAL VOC dataset: direct XML parsing + YOLO target encoding.

Parity with reference src/yolo/dataset.py without torchvision: the VOC
directory layout (VOCdevkit/VOC{year}/{JPEGImages,Annotations,ImageSets/Main})
is read directly; Kaggle layouts handled like the reference (2007 split
archive dirs, dataset.py:75-88; 2012 ``VOCdevkit`` fix-up, dataset.py:249-277,
done here WITHOUT mutating the dataset directory — no symlink writes needed
when you parse paths yourself).

Target encoding parity (dataset.py:487-532): cell i = int(S*y), j = int(S*x)
clamped to S-1; cell-relative x/y; conf 1.0 in slot 0 only; one-hot class at
5*B + class_id; ONE object per cell, first wins.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from yolo_tpu.data import transforms as T

VOC_CLASSES = [
    "aeroplane",
    "bicycle",
    "bird",
    "boat",
    "bottle",
    "bus",
    "car",
    "cat",
    "chair",
    "cow",
    "diningtable",
    "dog",
    "horse",
    "motorbike",
    "person",
    "pottedplant",
    "sheep",
    "sofa",
    "train",
    "tvmonitor",
]

CLASS_TO_IDX = {name: i for i, name in enumerate(VOC_CLASSES)}

# Kaggle archive directory names per (year, split) (dataset.py:75-88).
SPLIT_PATHS = {
    "2007": {
        "trainval": "VOCtrainval_06-Nov-2007",
        "test": "VOCtest_06-Nov-2007",
        "train": "VOCtrainval_06-Nov-2007",
        "val": "VOCtrainval_06-Nov-2007",
    },
    "2012": {
        "trainval": "VOCtrainval_11-May-2012",
        "test": "VOCtest_11-May-2012",
        "train": "VOCtrainval_11-May-2012",
        "val": "VOCtrainval_11-May-2012",
    },
}

KAGGLE_DATASETS = {
    "2007": "zaraks/pascal-voc-2007",
    "2012": "huanghanchina/pascal-voc-2012",
}


def parse_voc_xml(
    xml_path: str | Path,
) -> Tuple[np.ndarray, List[int], Tuple[int, int]]:
    """Parse one VOC annotation XML.

    Returns (boxes, class_ids, (img_width, img_height)) where boxes is an
    (M, 4) float32 array of normalized center-format boxes clamped to [0, 1]
    (reference clamping: dataset.py:459-462). Unknown class names are skipped.
    """
    root = ET.parse(str(xml_path)).getroot()
    size = root.find("size")
    img_w = float(size.find("width").text)
    img_h = float(size.find("height").text)

    boxes, class_ids = [], []
    for obj in root.iter("object"):
        name = obj.find("name").text
        if name not in CLASS_TO_IDX:
            continue
        bb = obj.find("bndbox")
        xmin = float(bb.find("xmin").text)
        ymin = float(bb.find("ymin").text)
        xmax = float(bb.find("xmax").text)
        ymax = float(bb.find("ymax").text)
        cx = np.clip((xmin + xmax) / 2.0 / img_w, 0.0, 1.0)
        cy = np.clip((ymin + ymax) / 2.0 / img_h, 0.0, 1.0)
        w = np.clip((xmax - xmin) / img_w, 0.0, 1.0)
        h = np.clip((ymax - ymin) / img_h, 0.0, 1.0)
        boxes.append([cx, cy, w, h])
        class_ids.append(CLASS_TO_IDX[name])
    return (
        np.asarray(boxes, np.float32).reshape(-1, 4),
        class_ids,
        (int(img_w), int(img_h)),
    )


def encode_target(
    boxes: np.ndarray,
    class_ids: Sequence[int],
    S: int = 7,
    B: int = 2,
    C: int = 20,
) -> np.ndarray:
    """Encode normalized center boxes into the (S, S, 5B+C) YOLO target.

    Exact reference semantics (dataset.py:487-532): first object to claim a
    cell wins; confidence written to slot 0 only.
    """
    target = np.zeros((S, S, 5 * B + C), np.float32)
    for box, class_id in zip(boxes, class_ids):
        cx, cy, w, h = (float(v) for v in box)
        i = min(int(S * cy), S - 1)
        j = min(int(S * cx), S - 1)
        if target[i, j, 4] == 0:
            target[i, j, 0] = S * cx - j
            target[i, j, 1] = S * cy - i
            target[i, j, 2] = w
            target[i, j, 3] = h
            target[i, j, 4] = 1.0
            target[i, j, 5 * B + int(class_id)] = 1.0
    return target


def _resolve_voc_dir(root: Path, year: str, image_set: str) -> Path:
    """Locate the VOC{year} directory under assorted Kaggle/official layouts."""
    base_year = year.split("-")[0]
    candidates = [
        root / SPLIT_PATHS.get(base_year, {}).get(image_set, "") / "VOCdevkit" / f"VOC{base_year}",
        root / "VOCdevkit" / f"VOC{base_year}",
        root / f"VOC{base_year}",
        root,
    ]
    for cand in candidates:
        if (cand / "JPEGImages").is_dir() and (cand / "Annotations").is_dir():
            return cand
    raise FileNotFoundError(
        f"Could not find VOC{base_year} (JPEGImages + Annotations) under {root};"
        f" tried {[str(c) for c in candidates]}"
    )


class VOCDetectionYOLO:
    """VOC dataset yielding (normalized image HWC float32, YOLO target).

    API parity with reference dataset.py:16-587 (year, image_set, download,
    S, B, transform, target_size, augment; VOC_CLASSES / class_to_idx /
    class_names attributes; visualize_sample).
    """

    VOC_CLASSES = VOC_CLASSES
    split_paths = SPLIT_PATHS

    @staticmethod
    def download_from_kaggle(year: str = "2007", verbose: bool = True):
        """Download VOC from Kaggle via kagglehub (reference dataset.py:90-158).

        Returns the download root Path, or None on failure. Requires the
        optional ``kagglehub`` package and network access.
        """
        if year not in KAGGLE_DATASETS:
            raise ValueError(
                f"Year '{year}' not supported. Choose from:"
                f" {list(KAGGLE_DATASETS.keys())}"
            )
        try:
            import kagglehub
        except ImportError:
            raise ImportError(
                "kagglehub package is required for Kaggle downloads."
            )
        if verbose:
            print(f"Downloading Pascal VOC {year} ({KAGGLE_DATASETS[year]})...")
        try:
            path = Path(kagglehub.dataset_download(KAGGLE_DATASETS[year]))
            if verbose:
                print(f"Dataset downloaded to: {path}")
            return path
        except Exception as exc:  # pragma: no cover - network dependent
            if verbose:
                print(f"Error downloading dataset: {exc}")
                print(
                    "Download manually from:"
                    f" https://www.kaggle.com/datasets/{KAGGLE_DATASETS[year]}"
                )
            return None

    def __init__(
        self,
        root: Optional[str | Path] = None,
        year: str = "2007",
        image_set: str = "train",
        download: bool = False,
        S: int = 7,
        B: int = 2,
        transform=None,
        target_size: Tuple[int, int] = (448, 448),
        augment: bool = True,
        seed: int = 0,
        normalize_host: bool = True,
    ):
        self.S = S
        self.B = B
        self.C = len(VOC_CLASSES)
        self.target_size = target_size
        self.augment = augment and image_set == "train"
        self.class_to_idx = CLASS_TO_IDX
        self.class_names = VOC_CLASSES
        self.transform = transform
        # normalize_host=False defers ImageNet normalization to the device
        # (uint8 batches: 4x smaller host->device transfer; see
        # transforms.device_normalize).
        self.normalize_host = normalize_host
        # Augmentation RNG is derived per (seed, epoch, idx) in __getitem__:
        # a stateless stream makes samples identical no matter which worker
        # (thread OR spawned process) decodes them, in any order.
        self.seed = seed
        self.epoch = 0

        base_year = year.split("-")[0]
        if download:
            kaggle_root = self.download_from_kaggle(year=base_year, verbose=True)
            if kaggle_root is None:
                raise RuntimeError(
                    f"Failed to download from Kaggle for year {base_year}"
                )
            root = kaggle_root
        if root is None:
            raise ValueError("root must be provided when download=False")

        voc_dir = _resolve_voc_dir(Path(root), year, image_set)
        split_file = voc_dir / "ImageSets" / "Main" / f"{image_set}.txt"
        if not split_file.exists():
            raise FileNotFoundError(f"Split list not found: {split_file}")
        ids = [line.strip() for line in split_file.read_text().splitlines() if line.strip()]
        self.images = [str(voc_dir / "JPEGImages" / f"{i}.jpg") for i in ids]
        self.annotations = [str(voc_dir / "Annotations" / f"{i}.xml") for i in ids]

    def __len__(self) -> int:
        return len(self.images)

    def set_epoch(self, epoch: int) -> None:
        """Mix the epoch into the per-sample augmentation streams."""
        self.epoch = int(epoch)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        image = T.load_image_rgb(self.images[idx])
        boxes, class_ids, _ = parse_voc_xml(self.annotations[idx])

        if self.transform is not None:
            image = self.transform(image)
        elif self.augment:
            rng = np.random.default_rng((self.seed, self.epoch, int(idx)))
            image, boxes = T.train_transform(
                image, boxes, rng, self.target_size,
                normalize_host=self.normalize_host,
            )
        else:
            image = T.eval_transform(
                image, self.target_size, normalize_host=self.normalize_host
            )

        target = encode_target(boxes, class_ids, self.S, self.B, self.C)
        if not self.normalize_host and image.dtype == np.uint8:
            return image, target
        return image.astype(np.float32), target

    def visualize_sample(self, idx: int, save_path: Optional[str] = None) -> dict:
        """Sample info for visualization (reference dataset.py:534-587).

        With ``save_path``, also renders the ground-truth boxes onto the
        image (PIL) and writes it there.
        """
        boxes, class_ids, _ = parse_voc_xml(self.annotations[idx])
        info = {
            "image_path": self.images[idx],
            "bboxes": boxes.tolist(),
            "class_ids": class_ids,
            "class_names": [self.class_names[c] for c in class_ids],
        }
        if save_path is not None:
            from PIL import Image

            from yolo_tpu.schemas import BoundingBox, Detection
            from yolo_tpu.utils.visualization import draw_detections

            dets = [
                Detection(
                    class_id=int(c),
                    class_name=self.class_names[int(c)],
                    confidence=1.0,
                    bbox=BoundingBox(x=float(b[0]), y=float(b[1]),
                                     width=float(b[2]), height=float(b[3])),
                )
                for b, c in zip(boxes, class_ids)
            ]
            image = Image.open(self.images[idx]).convert("RGB")
            draw_detections(image, dets, self.class_names).save(save_path)
            info["saved_to"] = save_path
        return info


class CombinedVOCDataset:
    """Concatenate multiple VOC datasets (reference dataset.py:590-659)."""

    def __init__(self, datasets: list):
        self.datasets = datasets
        self.lengths = [len(ds) for ds in datasets]
        self.cumulative = np.concatenate(([0], np.cumsum(self.lengths)))
        if datasets:
            self.S = datasets[0].S
            self.B = datasets[0].B
            self.C = datasets[0].C
            self.class_names = datasets[0].class_names
            self.class_to_idx = datasets[0].class_to_idx
            for ds in datasets[1:]:
                assert ds.S == self.S, f"All datasets must have same S: {self.S} != {ds.S}"
                assert ds.B == self.B, f"All datasets must have same B: {self.B} != {ds.B}"
                assert ds.C == self.C, f"All datasets must have same C: {self.C} != {ds.C}"

    def __len__(self) -> int:
        return int(sum(self.lengths))

    def set_epoch(self, epoch: int) -> None:
        for ds in self.datasets:
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)

    def __getitem__(self, idx: int):
        ds_idx = int(np.searchsorted(self.cumulative, idx, side="right")) - 1
        return self.datasets[ds_idx][idx - int(self.cumulative[ds_idx])]


def create_voc_datasets(
    years_and_splits: List[Tuple[str, str]],
    download: bool = True,
    S: int = 7,
    B: int = 2,
    target_size: Tuple[int, int] = (448, 448),
    augment: bool = True,
    root: Optional[str | Path] = None,
    normalize_host: bool = True,
):
    """Build one (possibly combined) dataset from (year, split) pairs
    (reference dataset.py:662-720)."""
    datasets = [
        VOCDetectionYOLO(
            root=root,
            year=year,
            image_set=image_set,
            download=download,
            S=S,
            B=B,
            target_size=target_size,
            augment=augment,
            normalize_host=normalize_host,
        )
        for year, image_set in years_and_splits
    ]
    return datasets[0] if len(datasets) == 1 else CombinedVOCDataset(datasets)
