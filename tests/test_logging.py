"""MetricWriter: tfevents scalars, hparams plugin protos, JSONL mirror.

Reference surface: src/yolo/training/logging.py:153-264 (per-batch/epoch
scalars + ``add_hparams``). The hparams check asserts the real TensorBoard
hparams-plugin payloads land in a timestamped sub-run, which is what the
reference's torch ``SummaryWriter.add_hparams`` produces.
"""

import glob
import json

from yolo_tpu.training.logging import MetricWriter, log_batch_metrics


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
