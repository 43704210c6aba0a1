"""Data pipeline tests: XML parsing, target encoding, transforms, loader.

Target-encoding semantics mirror reference dataset.py:487-532 (cell indexing,
cell-relative coords, first-object-wins) and the wrapper tests in reference
tests/test_voc_wrapper.py — but run against a synthetic VOC directory, so CI
needs no real dataset."""

from pathlib import Path

import numpy as np
import pytest

from yolo_tpu.data import (
    VOC_CLASSES,
    CombinedVOCDataset,
    DataLoader,
    VOCDetectionYOLO,
    create_voc_datasets,
    encode_target,
    parse_voc_xml,
)
from yolo_tpu.data.transforms import (
    eval_transform,
    sample_resized_crop,
    train_transform,
)

XML_TEMPLATE = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""

OBJ_TEMPLATE = """<object>
  <name>{name}</name>
  <bndbox><xmin>{xmin}</xmin><ymin>{ymin}</ymin><xmax>{xmax}</xmax><ymax>{ymax}</ymax></bndbox>
</object>"""


def make_voc_tree(root: Path, year="2007", split="train", n_images=4):
    voc = root / "VOCdevkit" / f"VOC{year}"
    (voc / "JPEGImages").mkdir(parents=True)
    (voc / "Annotations").mkdir(parents=True)
    (voc / "ImageSets" / "Main").mkdir(parents=True)
    from PIL import Image

    ids = []
    rng = np.random.default_rng(0)
    for k in range(n_images):
        img_id = f"{k:06d}"
        ids.append(img_id)
        w, h = 320, 240
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
        ).save(voc / "JPEGImages" / f"{img_id}.jpg")
        objs = OBJ_TEMPLATE.format(name="dog", xmin=40, ymin=30, xmax=200, ymax=180)
        objs += OBJ_TEMPLATE.format(name="cat", xmin=220, ymin=100, xmax=300, ymax=200)
        (voc / "Annotations" / f"{img_id}.xml").write_text(
            XML_TEMPLATE.format(w=w, h=h, objects=objs)
        )
    (voc / "ImageSets" / "Main" / f"{split}.txt").write_text("\n".join(ids))
    return root


def test_parse_voc_xml(tmp_path):
    make_voc_tree(tmp_path)
    xml = tmp_path / "VOCdevkit" / "VOC2007" / "Annotations" / "000000.xml"
    boxes, class_ids, (w, h) = parse_voc_xml(xml)
    assert (w, h) == (320, 240)
    assert class_ids == [VOC_CLASSES.index("dog"), VOC_CLASSES.index("cat")]
    np.testing.assert_allclose(
        boxes[0], [(40 + 200) / 2 / 320, (30 + 180) / 2 / 240, 160 / 320, 150 / 240],
        atol=1e-6,
    )


def test_encode_target_semantics():
    S, B, C = 7, 2, 20
    # Box centered at (0.5, 0.5) -> cell (3, 3), cell-relative (0.5, 0.5).
    boxes = np.array([[0.5, 0.5, 0.2, 0.3]], np.float32)
    t = encode_target(boxes, [4], S, B, C)
    assert t.shape == (S, S, 30)
    np.testing.assert_allclose(t[3, 3, 0:5], [0.5, 0.5, 0.2, 0.3, 1.0], atol=1e-6)
    assert t[3, 3, 5 * B + 4] == 1.0
    assert t[3, 3, 9] == 0.0  # slot-1 confidence untouched
    assert t.sum() == pytest.approx(0.5 + 0.5 + 0.2 + 0.3 + 1.0 + 1.0)


def test_encode_target_first_wins():
    boxes = np.array([[0.5, 0.5, 0.2, 0.2], [0.51, 0.51, 0.3, 0.3]], np.float32)
    t = encode_target(boxes, [1, 2], 7, 2, 20)
    # Both land in cell (3,3); the first claims it.
    assert t[3, 3, 2] == pytest.approx(0.2)
    assert t[3, 3, 10 + 1] == 1.0
    assert t[3, 3, 10 + 2] == 0.0


def test_encode_target_boundary_clamp():
    t = encode_target(np.array([[1.0, 1.0, 0.1, 0.1]], np.float32), [0], 7, 2, 20)
    assert t[6, 6, 4] == 1.0  # clamped to last cell


def test_eval_transform_shape_and_stats():
    img = np.full((240, 320, 3), 128, np.uint8)
    out = eval_transform(img, (448, 448))
    assert out.shape == (448, 448, 3)
    # 128/255 normalized by ImageNet stats: channel 0 ~ (0.502-0.485)/0.229.
    assert abs(out[..., 0].mean() - (128 / 255 - 0.485) / 0.229) < 1e-2


def test_sample_resized_crop_bounds():
    rng = np.random.default_rng(0)
    for _ in range(50):
        top, left, h, w = sample_resized_crop(rng, 240, 320)
        assert 0 <= top and top + h <= 240
        assert 0 <= left and left + w <= 320
        assert h > 0 and w > 0


def test_train_transform_boxes_stay_normalized():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).integers(0, 255, (240, 320, 3), dtype=np.uint8)
    boxes = np.array([[0.5, 0.5, 0.4, 0.4], [0.1, 0.1, 0.1, 0.1]], np.float32)
    for _ in range(10):
        out_img, out_boxes = train_transform(img, boxes, rng)
        assert out_img.shape == (448, 448, 3)
        assert out_boxes.shape == boxes.shape
        assert (out_boxes >= 0).all() and (out_boxes <= 1).all()


def test_dataset_end_to_end(tmp_path):
    make_voc_tree(tmp_path)
    ds = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train",
                          augment=False)
    assert len(ds) == 4
    image, target = ds[0]
    assert image.shape == (448, 448, 3) and image.dtype == np.float32
    assert target.shape == (7, 7, 30)
    assert target[..., 4].sum() == 2  # two objects, distinct cells
    info = ds.visualize_sample(0)
    assert info["class_names"] == ["dog", "cat"]


def test_dataset_augmented(tmp_path):
    make_voc_tree(tmp_path)
    ds = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train",
                          augment=True)
    image, target = ds[0]
    assert image.shape == (448, 448, 3)
    assert target.shape == (7, 7, 30)


def test_combined_dataset(tmp_path):
    make_voc_tree(tmp_path / "a")
    make_voc_tree(tmp_path / "b")
    d1 = VOCDetectionYOLO(root=tmp_path / "a", year="2007", image_set="train",
                          augment=False)
    d2 = VOCDetectionYOLO(root=tmp_path / "b", year="2007", image_set="train",
                          augment=False)
    combined = CombinedVOCDataset([d1, d2])
    assert len(combined) == 8
    img, tgt = combined[5]  # routes into d2
    assert img.shape == (448, 448, 3)


def test_create_voc_datasets_single(tmp_path):
    make_voc_tree(tmp_path)
    ds = create_voc_datasets([("2007", "train")], download=False, root=tmp_path,
                             augment=False)
    assert isinstance(ds, VOCDetectionYOLO)


def test_loader_batches_and_shapes(tmp_path):
    make_voc_tree(tmp_path)
    ds = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train",
                          augment=False)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    images, targets = batches[0]
    assert images.shape == (2, 448, 448, 3)
    assert targets.shape == (2, 7, 7, 30)


def test_loader_shuffle_determinism(tmp_path):
    make_voc_tree(tmp_path)
    ds = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train",
                          augment=False)
    l1 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=0, seed=7)
    l2 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=0, seed=7)
    b1 = next(iter(l1))[0]
    b2 = next(iter(l2))[0]
    np.testing.assert_array_equal(b1, b2)
    l2.set_epoch(1)
    b3 = next(iter(l2))[0]
    assert not np.array_equal(b1, b3)


def test_normalize_host_false_uint8_path(tmp_path):
    """normalize_host=False ships uint8; device_normalize matches host math."""
    import jax.numpy as jnp

    from yolo_tpu.data.transforms import device_normalize, normalize

    make_voc_tree(tmp_path)
    ds_u8 = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train",
                             augment=False, normalize_host=False)
    img_u8, target = ds_u8[0]
    assert img_u8.dtype == np.uint8
    assert img_u8.shape == (448, 448, 3)

    ds_f32 = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train",
                              augment=False)
    img_f32, _ = ds_f32[0]
    on_device = np.asarray(device_normalize(jnp.asarray(img_u8)))
    np.testing.assert_allclose(on_device, img_f32, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(normalize(img_u8), img_f32, rtol=1e-5, atol=1e-5)


def test_loader_propagates_worker_errors():
    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("decode failed")
            img = np.zeros((4, 4, 3), np.float32)
            return img, np.zeros((7, 7, 30), np.float32)

    loader = DataLoader(Broken(), batch_size=4, num_workers=2, drop_last=False)
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in loader:
            pass


def test_loader_shard_by_process_single_host():
    class Ds:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), np.zeros((1,), np.float32)

    # Single process: sharding is a no-op and all samples appear exactly once.
    loader = DataLoader(Ds(), batch_size=4, num_workers=0, shard_by_process=True)
    seen = []
    for images, _ in loader:
        seen.extend(int(images[k, 0, 0, 0]) for k in range(images.shape[0]))
    assert sorted(seen) == list(range(8))


def test_metric_writer_jsonl(tmp_path):
    from yolo_tpu.training.logging import MetricWriter

    w = MetricWriter(tmp_path)
    w.add_scalar("train/loss", 1.5, 3)
    w.add_hparams({"lr": 1e-4}, {"best": 0.5})
    w.close()
    import json

    lines = [json.loads(line) for line in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert {"tag": "train/loss", "value": 1.5, "step": 3} in lines
    assert any("hparams_summary" in rec for rec in lines)


def test_loader_worker_types_equivalent(tmp_path):
    """Thread, process, and synchronous loaders yield IDENTICAL batches —
    augmentation draws come from per-(seed, epoch, idx) stateless streams,
    not a shared RNG, so worker scheduling cannot change sample content.
    Process mode = the reference's worker-process semantics (train.py:130)."""
    make_voc_tree(tmp_path, n_images=6)
    ds = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train",
                          augment=True, seed=3)

    def collect(worker_type, num_workers):
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=5,
                            num_workers=num_workers, worker_type=worker_type)
        loader.set_epoch(1)
        try:
            return list(loader)
        finally:
            loader.close()

    sync = collect("thread", 0)
    threaded = collect("thread", 2)
    procs = collect("process", 2)
    assert len(sync) == len(threaded) == len(procs) == 3
    for (si, st), (ti, tt), (pi, pt) in zip(sync, threaded, procs):
        np.testing.assert_array_equal(si, ti)
        np.testing.assert_array_equal(st, tt)
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(st, pt)


def test_augmentation_epoch_streams(tmp_path):
    """set_epoch changes augmentation draws; same epoch reproduces them."""
    make_voc_tree(tmp_path, n_images=2)
    ds = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train",
                          augment=True, seed=0)
    a = ds[0][0].copy()
    a_again = ds[0][0].copy()
    np.testing.assert_array_equal(a, a_again)  # stateless per-sample stream
    ds.set_epoch(1)
    b = ds[0][0]
    assert not np.array_equal(a, b)
    ds.set_epoch(0)
    np.testing.assert_array_equal(a, ds[0][0])


def test_loader_worker_type_validation(tmp_path):
    make_voc_tree(tmp_path, n_images=2)
    ds = VOCDetectionYOLO(root=tmp_path, year="2007", image_set="train")
    with pytest.raises(ValueError, match="worker_type"):
        DataLoader(ds, batch_size=1, worker_type="bogus")
