"""MetricWriter: tfevents scalars, hparams plugin protos, JSONL mirror.

Reference surface: src/yolo/training/logging.py:153-264 (per-batch/epoch
scalars + ``add_hparams``). The hparams check asserts the real TensorBoard
hparams-plugin payloads land in a timestamped sub-run, which is what the
reference's torch ``SummaryWriter.add_hparams`` produces.
"""

import glob
import json

from yolo_tpu.training.logging import (
    MetricWriter,
    log_batch_metrics,
    log_epoch_metrics,
)


def test_scalars_and_jsonl_mirror(tmp_path):
    w = MetricWriter(tmp_path)
    log_batch_metrics(w, {"total": 3.0, "coord": 1.0}, epoch=2, batch_idx=5,
                      num_batches=10)
    w.close()

    lines = [json.loads(x) for x in (tmp_path / "metrics.jsonl").read_text()
             .splitlines()]
    tags = {rec["tag"]: rec for rec in lines if "tag" in rec}
    assert tags["batch/loss_total"]["value"] == 3.0
    assert tags["batch/loss_total"]["step"] == 15  # (2-1)*10+5
    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))


def test_epoch_tags_match_reference_layout(tmp_path):
    """Tag-for-tag parity with the reference's epoch scalar layout
    (reference src/yolo/training/logging.py:202-238)."""
    loss = {"total": 3.0, "coord": 1.0, "conf_obj": 0.5, "conf_noobj": 0.4,
            "class": 1.1}
    val = dict(loss)
    val.update({
        "mAP50:95": 0.21, "mAP50": 0.43, "mAP75": 0.14,
        "precision": 0.17, "recall": 0.52,
        "mAP50:95_small": 0.08, "mAP50:95_medium": 0.09,
        "mAP50:95_large": 0.26,
        # extra evaluator keys the reference does NOT log per epoch:
        "mAP50_small": 0.08, "AP50_class_0": 0.7,
    })
    w = MetricWriter(tmp_path)
    log_epoch_metrics(w, loss, val, learning_rate=1e-4, epoch=3)
    w.close()

    recs = [json.loads(x) for x in (tmp_path / "metrics.jsonl").read_text()
            .splitlines()]
    tags = {rec["tag"] for rec in recs if "tag" in rec}
    expected = (
        {f"epoch/train_loss_{k}" for k in loss}
        | {f"epoch/val_loss_{k}" for k in loss}
        | {"epoch/learning_rate", "epoch/mAP50:95", "epoch/mAP50",
           "epoch/mAP75", "epoch/precision", "epoch/recall",
           "epoch/mAP50:95_small", "epoch/mAP50:95_medium",
           "epoch/mAP50:95_large"}
    )
    assert tags == expected


def test_add_hparams_writes_plugin_protos(tmp_path):
    w = MetricWriter(tmp_path)
    w.add_hparams(
        {"lr": 1e-4, "batch_size": 64, "backbone": "resnet", "amp": True},
        {"best_val_loss": 2.1, "mAP50": 0.43, "ignored": "not-a-number"},
    )
    w.close()

    sub_events = [
        p for p in glob.glob(str(tmp_path / "*" / "events.out.tfevents.*"))
    ]
    assert sub_events, "hparams must create a timestamped sub-run"
    payload = open(sub_events[0], "rb").read()
    assert b"_hparams_/experiment" in payload
    assert b"_hparams_/session_start_info" in payload
    assert b"_hparams_/session_end_info" in payload

    # JSONL mirror records both dicts.
    recs = [json.loads(x) for x in (tmp_path / "metrics.jsonl").read_text()
            .splitlines()]
    summary = next(r for r in recs if "hparams_summary" in r)["hparams_summary"]
    assert summary["hparams"]["backbone"] == "resnet"
    assert summary["final_metrics"]["mAP50"] == 0.43


def test_epoch_metrics_with_custom_iou_thresholds(tmp_path):
    """Evaluator runs with custom iou_thresholds omit mAP50/mAP75 while
    still emitting mAP50:95 — epoch logging must log what exists instead
    of raising KeyError (round-3 review finding)."""
    loss = {"total": 3.0}
    val = {"total": 2.5, "mAP50:95": 0.21, "precision": 0.17,
           "recall": 0.52}  # no mAP50 / mAP75
    w = MetricWriter(tmp_path)
    log_epoch_metrics(w, loss, val, learning_rate=1e-4, epoch=1)
    w.close()
    recs = [json.loads(x) for x in (tmp_path / "metrics.jsonl").read_text()
            .splitlines()]
    tags = {r["tag"] for r in recs if "tag" in r}
    assert "epoch/mAP50:95" in tags and "epoch/precision" in tags
    assert "epoch/mAP50" not in tags and "epoch/mAP75" not in tags
