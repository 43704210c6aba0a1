"""Decode + NMS op tests, mirroring reference coverage
(tests/test_yolo.py:85-124 decode, 229-313 NMS)."""

import jax.numpy as jnp
import numpy as np

from yolo_tpu.ops.decode import Detections, decode_predictions, decode_ground_truth
from yolo_tpu.ops.nms import batched_nms

S, B, C = 7, 2, 20


def make_pred(cells):
    """Build a (1, S, S, B*5+C) grid; cells: {(i, j): [(box5, class_id)]}."""
    pred = np.zeros((1, S, S, B * 5 + C), np.float32)
    for (i, j), entries in cells.items():
        for b, (box5, cid) in enumerate(entries):
            pred[0, i, j, b * 5 : b * 5 + 5] = box5
            pred[0, i, j, B * 5 + cid] = 1.0
    return jnp.asarray(pred)


def test_decode_absolute_coords_and_score():
    # Cell (2, 3), box offset (0.5, 0.5) -> abs center ((3+0.5)/7, (2+0.5)/7).
    pred = make_pred({(2, 3): [((0.5, 0.5, 0.2, 0.3, 0.8), 5)]})
    dets = decode_predictions(pred, S, B, C, conf_threshold=0.1)
    k = (2 * S + 3) * B + 0
    np.testing.assert_allclose(
        np.asarray(dets.boxes[0, k]), [3.5 / 7, 2.5 / 7, 0.2, 0.3], atol=1e-6
    )
    assert abs(float(dets.scores[0, k]) - 0.8) < 1e-6  # conf * classprob(1.0)
    assert int(dets.class_ids[0, k]) == 5
    assert bool(dets.valid[0, k])
    # Every other slot has score 0 -> invalid at 0.1 threshold.
    assert int(dets.valid.sum()) == 1


def test_decode_threshold_strict():
    pred = make_pred({(0, 0): [((0.5, 0.5, 0.2, 0.2, 0.5), 1)]})
    dets = decode_predictions(pred, S, B, C, conf_threshold=0.5)
    assert int(dets.valid.sum()) == 0  # 0.5 > 0.5 is False (strict)
    dets = decode_predictions(pred, S, B, C, conf_threshold=0.49)
    assert int(dets.valid.sum()) == 1


def test_decode_ground_truth_slot0():
    target = np.zeros((1, S, S, B * 5 + C), np.float32)
    target[0, 4, 1, :5] = [0.25, 0.75, 0.3, 0.4, 1.0]
    target[0, 4, 1, B * 5 + 7] = 1.0
    gts = decode_ground_truth(jnp.asarray(target), S, B, C)
    k = 4 * S + 1
    assert bool(gts.valid[0, k]) and int(gts.valid.sum()) == 1
    np.testing.assert_allclose(
        np.asarray(gts.boxes[0, k]), [1.25 / 7, 4.75 / 7, 0.3, 0.4], atol=1e-6
    )
    assert int(gts.class_ids[0, k]) == 7


def _dets(boxes, scores, class_ids, valid=None):
    boxes = jnp.asarray(boxes, jnp.float32)[None]
    scores = jnp.asarray(scores, jnp.float32)[None]
    class_ids = jnp.asarray(class_ids, jnp.int32)[None]
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    else:
        valid = jnp.asarray(valid, bool)[None]
    return Detections(boxes=boxes, scores=scores, class_ids=class_ids, valid=valid)


def test_nms_suppresses_same_class_overlap():
    dets = _dets(
        boxes=[[0.5, 0.5, 0.2, 0.2], [0.51, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]],
        scores=[0.9, 0.8, 0.7],
        class_ids=[3, 3, 3],
    )
    out = batched_nms(dets, 0.4)
    assert np.asarray(out.valid[0]).tolist() == [True, False, True]


def test_nms_keeps_different_classes():
    dets = _dets(
        boxes=[[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]],
        scores=[0.9, 0.8],
        class_ids=[3, 4],
    )
    out = batched_nms(dets, 0.4)
    assert np.asarray(out.valid[0]).tolist() == [True, True]


def test_nms_invalid_boxes_never_suppress():
    # The highest-scoring box is below the conf threshold (invalid) — it must
    # not suppress the valid overlapping box.
    dets = _dets(
        boxes=[[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]],
        scores=[0.9, 0.8],
        class_ids=[3, 3],
        valid=[False, True],
    )
    out = batched_nms(dets, 0.4)
    assert np.asarray(out.valid[0]).tolist() == [False, True]


def test_nms_chain_release():
    # Greedy semantics: A suppresses B; B would have suppressed C, but since B
    # is gone, C survives (exactly what sequential greedy produces).
    dets = _dets(
        boxes=[
            [0.50, 0.5, 0.20, 0.2],
            [0.58, 0.5, 0.20, 0.2],  # IoU(A,B) high -> suppressed by A
            [0.66, 0.5, 0.20, 0.2],  # IoU(A,C) low, IoU(B,C) high -> kept
        ],
        scores=[0.9, 0.8, 0.7],
        class_ids=[0, 0, 0],
    )
    out = batched_nms(dets, 0.4)
    valid = np.asarray(out.valid[0]).tolist()
    assert valid[0] and not valid[1] and valid[2]


def test_nms_empty_input():
    dets = _dets(
        boxes=np.zeros((4, 4)), scores=np.zeros(4), class_ids=np.zeros(4),
        valid=np.zeros(4),
    )
    out = batched_nms(dets, 0.4)
    assert int(out.valid.sum()) == 0


def test_nms_full_pipeline_from_grid():
    # Two boxes in adjacent cells decoding to near-identical absolute boxes.
    pred = np.zeros((1, S, S, B * 5 + C), np.float32)
    pred[0, 3, 3, 0:5] = [0.9, 0.5, 0.3, 0.3, 0.9]  # abs x=(3+0.9)/7
    pred[0, 3, 4, 0:5] = [0.0, 0.5, 0.3, 0.3, 0.8]  # abs x=(4+0.0)/7 ~ overlap
    pred[0, 3, 3, B * 5 + 2] = 1.0
    pred[0, 3, 4, B * 5 + 2] = 1.0
    dets = decode_predictions(jnp.asarray(pred), S, B, C, 0.5)
    out = batched_nms(dets, 0.4)
    kept = np.nonzero(np.asarray(out.valid[0]))[0]
    assert len(kept) == 1
    assert float(out.scores[0, kept[0]]) > 0.85


def test_pallas_nms_matches_xla_nms():
    """The fused Pallas greedy-NMS kernel (interpret mode on CPU) keeps the
    exact same candidate set as the XLA argsort+scan implementation."""
    import numpy as np

    from yolo_tpu.ops.decode import decode_predictions
    from yolo_tpu.ops.nms import batched_nms
    from yolo_tpu.ops.pallas_nms import pallas_nms

    rng = np.random.default_rng(7)
    for _ in range(3):
        pred = rng.uniform(0, 1, size=(4, 7, 7, 30)).astype(np.float32)
        dets = decode_predictions(jnp.asarray(pred), 7, 2, 20, 0.3)
        ref = batched_nms(dets, 0.4)
        ours = pallas_nms(dets, 0.4, interpret=True)
        assert bool(jnp.all(ref.valid == ours.valid))


def test_pallas_nms_large_grid_multi_lane_padding():
    """S=9, B=2 -> K=162 > 128 lanes: exercises the L=256 padded-lane path."""
    import numpy as np

    from yolo_tpu.ops.decode import decode_predictions
    from yolo_tpu.ops.nms import batched_nms
    from yolo_tpu.ops.pallas_nms import pallas_nms

    rng = np.random.default_rng(11)
    pred = rng.uniform(0, 1, size=(3, 9, 9, 2 * 5 + 20)).astype(np.float32)
    dets = decode_predictions(jnp.asarray(pred), 9, 2, 20, 0.3)
    assert dets.scores.shape[-1] == 162
    ref = batched_nms(dets, 0.4)
    ours = pallas_nms(dets, 0.4, interpret=True)
    assert bool(jnp.all(ref.valid == ours.valid))
